"""PySpark-native analytics / ML-data-pipeline engine.

A from-scratch, Spark-first re-expression of the capabilities of
criteo/ml-hadoop-experiment (reference surveyed in SURVEY.md):

- vectorized model-inference column operators (Arrow ``pandas_udf``)
- stratified weighted sampling with deterministic / random sampling columns
- vocabulary (distinct-with-threshold) aggregation as DataFrame ops
- feature-spec schema layer with Spark<->tensor type validation
- dense / sparse (COO) tensor conversion, both in-UDF and relational forms
- TFRecord-style record encode/decode (optional TF extra), events reader

plus large-scale training-data pipeline extensions (not in the reference):
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
similarity search (brute-force + LSH), text analysis (language-id, quality,
token counting, fingerprinting), multimodal binary-column plumbing, and
Structured Streaming inference.

Design rules (SURVEY.md §7): DataFrame-only public API, Arrow-vectorized
UDF substrate, explicit seeds on all randomness, no unbounded driver-side
collects, Catalyst-friendly (declarative) plans.
"""

__version__ = "0.1.0"
