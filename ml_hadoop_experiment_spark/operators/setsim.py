"""Exact set-similarity join: ALL pairs with n-gram Jaccard >= t.

The MinHash-LSH pipeline (operators/dedup.py) is probabilistic — its
banding scheme trades recall for candidate sparsity, and the recall gap
is real (the ``lsh_bucket_overflow`` audit exists because of it). Some
curation decisions need the complete answer: legal/contamination
sweeps, eval-set leakage checks, dedup QA sampling. This module gives
the exact join with the candidate-explosion problem handled by PREFIX
FILTERING (the PPJoin family — Chaudhuri/Ganti/Kaushik ICDE'06,
Xiao et al. WWW'08 — both public literature):

  order every document's distinct shingles by GLOBAL ascending document
  frequency (rarest first, ties by token text); a pair can only reach
  Jaccard ``t`` if its two PREFIXES intersect, where a set of size n
  keeps its first ``n - ceil(t*n) + 1`` rarest tokens. So the candidate
  equi-join runs over the prefix inverted index only — and because the
  ordering puts the most common shingles LAST, the high-fan-out index
  entries (stopword shingles, boilerplate) never enter the join. That
  is the scale story: candidate cost tracks rare-token co-occurrence,
  not raw index squaring, and the skewed head of the token distribution
  is structurally excluded.

Completeness argument (why the prefix join loses nothing): Jaccard
J(A,B) >= t implies |A∩B| >= t*|A∪B| >= t*max(|A|,|B|), so the overlap
is at least alpha = ceil(t*|A|) and at least ceil(t*|B|). Under one
global token order, if |A∩B| >= alpha then the first |A|-alpha+1 tokens
of A and the first |B|-alpha+1 tokens of B must share an element
(outside the prefix, A has only alpha-1 tokens left — too few to hold
the whole overlap; same for B; a shared token minimal in the global
order lies in both prefixes). Our per-set prefixes use the per-set
alpha, which is <= the pair's alpha, so they are supersets of the
lemma's prefixes — still complete, merely more candidates.

Verification reuses the exact :func:`~.dedup.jaccard_pairs` scorer, so
the result contract (rounding, thresholds, zero-token caveats) is
identical to the LSH pipeline's — only the candidate generator changes
from probabilistic to complete.

Reference parity: criteo/ml-hadoop-experiment has no similarity join
(its ~2.1k LoC are ML-inference glue; see SURVEY.md §2). This is
north-star extension surface for training-data curation.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import (
    AUTO_PERSIST_BYTES,
    _estimated_input_bytes,
    jaccard_pairs,
    tokens_frame,
)

#: nudge for float ceil/threshold comparisons: when t*n lands exactly on
#: an integer, IEEE rounding can push the product one ulp ABOVE it and
#: ceil then over-shortens the prefix (losing completeness). Subtracting
#: an epsilon can only lengthen a prefix / admit a borderline candidate
#: — errs toward more candidates, never toward a missed pair.
_CEIL_EPS = 1e-9


def prefix_posting_overflow(
    tokens: DataFrame, threshold: float, max_posting_width: int
) -> DataFrame:
    """Audit for the ``max_posting_width`` cap: ``(token, width)`` for
    every PREFIX token whose posting list exceeds the cap — the same
    observability contract as the LSH family's ``lsh_bucket_overflow``.
    Nonempty output means a capped :func:`jaccard_join` sacrificed
    completeness on pairs whose every shared prefix token is listed
    here; run it before trusting a capped sweep."""
    prefix = _prefix_frame(tokens, threshold)
    return (
        prefix.groupBy("token")
        .agg(F.count(F.lit(1)).alias("width"))
        .where(F.col("width") > max_posting_width)
    )


def _prefix_frame(tokens: DataFrame, threshold: float) -> DataFrame:
    """(id, token, __n, __pos): each set's completeness-preserving
    prefix under the global rarest-first order (see module docstring)."""
    sizes = tokens.groupBy("id").agg(F.count("*").alias("__n"))
    dfreq = tokens.groupBy("token").agg(F.count("*").alias("__df"))
    ranked = tokens.join(dfreq, "token").withColumn(
        "__pos",
        F.row_number().over(
            Window.partitionBy("id").orderBy("__df", "token")
        ),
    )
    return (
        ranked.join(sizes, "id")
        .where(
            F.col("__pos")
            <= F.col("__n")
            - F.ceil(F.lit(threshold) * F.col("__n") - F.lit(_CEIL_EPS))
            + F.lit(1)
        )
        .select("id", "token", "__n", "__pos")
    )


def prefix_filter_candidates(
    tokens: DataFrame,
    threshold: float,
    max_posting_width: int | None = None,
) -> DataFrame:
    """COMPLETE candidate pairs (id_a < id_b) for Jaccard >= ``threshold``
    from a distinct ``(id, token)`` frame (see module docstring for the
    prefix-filtering lemma).

    Plan: one agg for per-doc sizes, one for global doc-frequency; the
    rank window partitions by id (per-document width — never a
    single-partition global window); the candidate equi-join touches
    prefix tokens only, then a symmetric length filter
    (min >= t * max, necessary since J <= min/max) prunes before the
    pair distinct. Shuffles: token (df join + candidate join), id
    (sizes + rank) — all keyed, none all-pairs.

    ``max_posting_width`` is the dup-heavy-corpus guard (same contract
    as the MinHash family's ``max_bucket_ids``): prefix tokens whose
    posting list exceeds the cap are dropped from the candidate join,
    bounding its cost at O(cap²) per token at an EXPLICIT recall cost —
    a pair is lost only if EVERY prefix token it shares is over-cap
    (measured on the 10× clone fixture: every doc in a 10-wide clone
    cluster drives candidates near-quadratic, SCALE.md). Audit the
    sacrifice with :func:`prefix_posting_overflow`; ``None`` (default)
    keeps the join exact and complete.
    """
    prefix = _prefix_frame(tokens, threshold)
    if max_posting_width is not None:
        wide = (
            prefix.groupBy("token")
            .agg(F.count(F.lit(1)).alias("__w"))
            .where(F.col("__w") > max_posting_width)
            .select("token")
        )
        prefix = prefix.join(wide, "token", "left_anti")
    a = prefix.select(
        F.col("id").alias("id_a"), "token",
        F.col("__n").alias("__n_a"), F.col("__pos").alias("__pa"),
    )
    b = prefix.select(
        F.col("id").alias("id_b"), "token",
        F.col("__n").alias("__n_b"), F.col("__pos").alias("__pb"),
    )
    # positional filter (PPJoin): the pair's required overlap is
    # alpha = ceil(t/(1+t) * (n_a+n_b)) (from J = i/(n_a+n_b-i) >= t);
    # a shared prefix token at positions (pa, pb) bounds the overlap by
    # 1 + min(n_a-pa, n_b-pb) (everything else shared comes later in
    # BOTH rarest-first lists). A true pair's EARLIEST shared token row
    # passes this bound, and the pair-distinct needs only one surviving
    # row — so dropping later-position rows loses nothing.
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold))
        * (F.col("__n_a") + F.col("__n_b"))
        - F.lit(_CEIL_EPS)
    )
    return (
        a.join(b, "token")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.least("__n_a", "__n_b")
                >= F.lit(threshold) * F.greatest("__n_a", "__n_b")
                - F.lit(_CEIL_EPS)
            )
            & (
                F.lit(1)
                + F.least(
                    F.col("__n_a") - F.col("__pa"),
                    F.col("__n_b") - F.col("__pb"),
                )
                >= alpha
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.4,
    shingle_size: int = 3,
    cache_intermediates: Optional[bool] = None,
    max_posting_width: Optional[int] = None,
) -> DataFrame:
    """Exact, complete n-gram Jaccard similarity self-join:
    ``(id_a, id_b, jaccard)`` for every pair with
    ``round(jaccard, 6) >= threshold``, id_a < id_b.

    Same tokenization (:func:`~.dedup.tokens_frame`, short-doc
    whole-text rule included) and the same exact verifier
    (:func:`~.dedup.jaccard_pairs`) as the MinHash pipeline — so a
    recall audit is one EXCEPT between this join and the LSH one.

    The token frame has FIVE consumers here (sizes, doc-frequency, the
    rank join, and the verifier's two sides), so the MinHash family's
    auto-persist rule (``AUTO_PERSIST_BYTES``, measured A/B in
    dedup.py) applies with even more force: ``cache_intermediates=None``
    persists the distinct token frame when the input's Catalyst
    estimate says recomputing five shingle+distinct subtrees costs more
    than caching; explicit True/False overrides. When persisted, the
    verifier runs with merge hints (``scale_safe_joins`` — persisted
    frames lie about their size to the broadcast planner).

    ``max_posting_width`` forwards to
    :func:`prefix_filter_candidates` — the explicit, audited recall
    trade for dup-heavy corpora (default ``None`` = exact+complete).
    """
    toks = tokens_frame(df, id_col, text_col, shingle_size)
    if cache_intermediates is None:
        cache_intermediates = _estimated_input_bytes(df) > AUTO_PERSIST_BYTES
    if cache_intermediates:
        from pyspark import StorageLevel

        toks = toks.persist(StorageLevel.MEMORY_AND_DISK)
    cands = prefix_filter_candidates(toks, threshold, max_posting_width)
    return jaccard_pairs(
        cands, toks, threshold=threshold,
        scale_safe_joins=bool(cache_intermediates),
    )


def topk_similar_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 100,
    floor: float = 0.2,
    shingle_size: int = 3,
    max_posting_width: int | None = None,
    probe_floor: Optional[float] = None,
) -> DataFrame:
    """The ``k`` MOST similar pairs above ``floor``:
    ``(id_a, id_b, jaccard)`` under the total order
    (jaccard DESC, id_a, id_b) — dedup QA's first question ("show me
    the worst offenders"), and the threshold-tuning view (sort the
    boundary region instead of guessing a cutoff).

    ``floor`` is load-bearing, not cosmetic: a global top-k with no
    similarity floor is the all-pairs problem (prefix filtering prunes
    NOTHING at threshold 0 — every token is its own prefix). The
    result is exact for every pair >= floor, so the top-k is exact
    whenever k pairs exist above it; fewer rows than k means the floor
    exhausted the corpus, which is itself the answer. Ordering
    compiles to TakeOrderedAndProject (per-partition heaps, no global
    sort); the candidate cost model (and the dup-heavy
    ``max_posting_width`` guard) is :func:`jaccard_join`'s.

    ``probe_floor`` is the adaptive-floor optimization: the answer's
    kth similarity is typically far above the caller's floor, and the
    prefix join's cost falls superlinearly as the threshold rises (a
    higher t keeps a shorter prefix per set AND tightens the length +
    positional filters). So run the complete join at ``probe_floor``
    first and keep its top-k when at least ``k`` pairs emerge — exact,
    because every pair >= probe_floor is enumerated and k of them
    bound the global top-k above the lower floor. The probe's k rows
    are pinned (k-row cache, never corpus-sized) so the decision
    ``count()`` and the caller's collection share one computation.
    Fewer than k probe rows → unpersist and rerun at ``floor`` — the
    only case that pays for both passes. The default is ``None``
    (probe OFF): the probe makes this call EAGER — deciding between
    the two plans runs the probe join and a ``count()`` at
    construction time and pins a k-row frame (registered with
    ``common.cache_registry`` so sweep drivers reclaim it between
    queries) — and a public constructor that is lazy by default must
    stay lazy by default. Callers that want the measured 2-2.5x win
    (SCALE.md round 9) opt in with ``probe_floor=0.7`` (or any probe
    above ``floor``), as the declared ``topk_similar_pairs`` query and
    bench do. A probe at or below ``floor`` is a no-op.
    """
    if k < 1:
        raise ValueError(f"k must be positive, got {k}")
    if floor <= 0.0:
        raise ValueError(
            "floor must be > 0: a floorless global top-k is the "
            "all-pairs problem (prefix filtering prunes nothing at 0)"
        )
    order = (F.desc("jaccard"), F.asc("id_a"), F.asc("id_b"))
    if probe_floor is not None and probe_floor > floor:
        from pyspark import StorageLevel

        from ..common.cache_registry import register_pinned

        probe = jaccard_join(
            df, id_col, text_col, threshold=probe_floor,
            shingle_size=shingle_size, max_posting_width=max_posting_width,
        )
        topk = (
            probe.orderBy(*order)
            .limit(k)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        if topk.count() >= k:
            register_pinned(topk)
            return topk
        topk.unpersist()
    pairs = jaccard_join(
        df, id_col, text_col, threshold=floor,
        shingle_size=shingle_size, max_posting_width=max_posting_width,
    )
    return pairs.orderBy(*order).limit(k)
