"""Corpus statistics: TF-IDF top-k terms."""

from __future__ import annotations

import math

import pytest

from ml_hadoop_experiment_spark.operators.corpus import tfidf_topk_terms


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "apple apple banana"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry durian"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_tfidf_golden(docs):
    out = tfidf_topk_terms(docs, "doc_id", "text", k=2).collect()
    got = {(r["id"], r["rk"]): (r["token"], r["tfidf"]) for r in out}

    def tfidf(tf, df):
        return round(tf * (math.log((3 + 1) / (df + 1)) + 1), 6)

    # doc 1: apple tf=2 df=1 beats banana tf=1 df=2
    assert got[(1, 1)] == ("apple", tfidf(2, 1))
    assert got[(1, 2)] == ("banana", tfidf(1, 2))
    # doc 2: banana and cherry tie (tf=1, df=2) -> token order breaks it
    assert got[(2, 1)] == ("banana", tfidf(1, 2))
    assert got[(2, 2)] == ("cherry", tfidf(1, 2))
    # doc 3: cherry tf=3 beats durian (rare but tf=1)
    assert got[(3, 1)] == ("cherry", tfidf(3, 2))
    assert got[(3, 2)] == ("durian", tfidf(1, 1))


def test_tfidf_k_validation_and_scalar_broadcast(docs):
    with pytest.raises(ValueError, match="k must be positive"):
        tfidf_topk_terms(docs, "doc_id", "text", k=0)
    plan = (
        tfidf_topk_terms(docs, "doc_id", "text", k=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the corpus-size scalar joins via broadcast, never a shuffle
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


class TestBm25TopkDocs:
    def _corpus(self, spark):
        import pandas as pd

        rows = [
            (1, "spark shuffles data across the cluster"),
            (2, "spark spark spark tuning guide"),
            (3, "gardening tips for spring flowers"),
            (4, "cluster management and spark deployment at scale"),
            (5, "data quality checks for training data pipelines data"),
        ]
        return spark.createDataFrame(pd.DataFrame(rows, columns=["id", "text"]))

    def test_ranks_term_frequency_and_rarity(self, spark):
        from ml_hadoop_experiment_spark.operators.corpus import bm25_topk_docs

        docs = self._corpus(spark)
        out = bm25_topk_docs(docs, "id", "text", ["spark"], k=3).collect()
        # doc 2 has tf=3 for 'spark' and is short -> best
        assert out[0]["id"] == 2
        ids = [r["id"] for r in out]
        assert 3 not in ids  # no hit, never appears
        assert all(r["n_hit_terms"] == 1 for r in out)

    def test_multi_term_scores_sum_and_rare_term_wins(self, spark):
        from ml_hadoop_experiment_spark.operators.corpus import bm25_topk_docs

        docs = self._corpus(spark)
        out = {r["id"]: r for r in bm25_topk_docs(
            docs, "id", "text", ["spark", "gardening"], k=5
        ).collect()}
        # 'gardening' appears in 1/5 docs -> higher idf than 'spark' (4/5)
        assert out[3]["bm25"] > 0
        assert out[3]["n_hit_terms"] == 1
        assert out[4]["n_hit_terms"] == 1

    def test_dataframe_query_terms(self, spark):
        from ml_hadoop_experiment_spark.operators.corpus import bm25_topk_docs
        from pyspark.sql import functions as F

        docs = self._corpus(spark)
        qdf = spark.createDataFrame([("spark",), ("spark",)], "token string")
        via_df = bm25_topk_docs(docs, "id", "text", qdf, k=3).collect()
        via_list = bm25_topk_docs(docs, "id", "text", ["spark"], k=3).collect()
        assert [tuple(r) for r in via_df] == [tuple(r) for r in via_list]

    def test_matches_duckdb_twin(self, spark):
        import duckdb
        import pandas as pd

        from ml_hadoop_experiment_spark.operators.corpus import (
            bm25_topk_docs,
            bm25_topk_sql,
        )

        docs = self._corpus(spark)
        got = bm25_topk_docs(docs, "id", "text", ["spark", "data"], k=5).toPandas()
        con = duckdb.connect()
        con.register("docs", docs.toPandas())
        want = con.execute(
            bm25_topk_sql("docs", "id", "text", ["spark", "data"], k=5)
        ).df()
        pd.testing.assert_frame_equal(
            got.sort_values("id", ignore_index=True)[sorted(got.columns)],
            want.sort_values("id", ignore_index=True)[sorted(got.columns)],
            check_dtype=False,
        )
        con.close()


class TestRareTokenRatio:
    def test_ratio_values(self, spark):
        from ml_hadoop_experiment_spark.operators.corpus import rare_token_ratio

        rows = [
            (1, "common common common xqzt"),
            (2, "common common"),
            (3, "wvut common"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               rare_token_ratio(df, "doc_id", "text", max_count=1).collect()}
        # 'common' count 6; 'xqzt','wvut' count 1 (rare)
        assert out[1]["n_tokens"] == 4 and out[1]["n_rare"] == 1
        assert out[1]["rare_ratio"] == 0.25
        assert out[2]["n_rare"] == 0 and out[2]["rare_ratio"] == 0.0
        assert out[3]["n_rare"] == 1 and out[3]["rare_ratio"] == 0.5

    def test_case_fold_and_trim(self, spark):
        from ml_hadoop_experiment_spark.operators.corpus import rare_token_ratio

        df = spark.createDataFrame(
            [(1, "  Foo foo  "), (2, "FOO bar")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in
               rare_token_ratio(df, "doc_id", "text", max_count=1).collect()}
        # 'foo' appears 3x after lowercasing -> not rare; 'bar' is
        assert out[1]["n_rare"] == 0
        assert out[2]["n_rare"] == 1


class TestBpePairCounts:
    def test_pair_counts_weighted_by_word_frequency(self, spark):
        """Hand-computed merge statistics: 'aab aab ab' -> words
        aab(x2), ab(x1); pairs: aa +1*2, ab +1*2 +1*1 = 3."""
        from ml_hadoop_experiment_spark.operators.corpus import bpe_pair_counts

        df = spark.createDataFrame([("aab aab ab",)], "text string")
        got = {r["pair"]: r["pair_count"] for r in bpe_pair_counts(df, "text").collect()}
        assert got == {"ab": 3, "aa": 2}

    def test_distinct_word_aggregation_and_short_words(self, spark):
        """Single-char words contribute nothing; counts accumulate
        across rows; lower/trim normalization applies."""
        from ml_hadoop_experiment_spark.operators.corpus import bpe_pair_counts

        df = spark.createDataFrame(
            [("  The the  ",), ("a the",)], "text string"
        )
        got = {r["pair"]: r["pair_count"] for r in bpe_pair_counts(df, "text").collect()}
        # 'the' x3 -> th:3, he:3; 'a' too short
        assert got == {"th": 3, "he": 3}

    def test_topk_total_order(self, spark):
        """k-th row is deterministic: ties break on pair ascending."""
        from ml_hadoop_experiment_spark.operators.corpus import bpe_pair_counts

        df = spark.createDataFrame([("xy zw xy zw",)], "text string")
        rows = bpe_pair_counts(df, "text", top_k=1).collect()
        assert [(r["pair"], r["pair_count"]) for r in rows] == [("xy", 2)]


class TestOverlapPairs:
    def test_subset_inclusion_scores_full_overlap(self, spark):
        """A short doc fully contained in a long doc: overlap 1.0 while
        jaccard is well below — the asymmetric case the operator exists
        for. The verifier is driven with EXPLICIT candidates (its
        documented pluggable-blocker contract): this exact pair is one
        MinHash-LSH itself may never band, because LSH recalls by
        JACCARD and this pair's jaccard is deliberately tiny — the
        recall caveat on overlap_pairs, demonstrated rather than
        papered over."""
        from ml_hadoop_experiment_spark.operators.dedup import (
            overlap_pairs,
            tokens_frame,
        )

        short = "alpha beta gamma delta epsilon"
        long = short + " zeta eta theta iota kappa lambda mu nu xi"
        df = spark.createDataFrame(
            [(1, short), (2, long)], "doc_id long, text string"
        )
        toks = tokens_frame(df, "doc_id", "text", shingle_size=3)
        cands = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        rows = overlap_pairs(cands, toks, threshold=0.9).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["id_a"], r["id_b"]) == (1, 2)
        assert r["overlap"] == 1.0
        assert r["jaccard"] < 0.5

    def test_matches_jaccard_pipeline_candidates(self, spark):
        """Same candidates as the Jaccard pipeline; overlap >= jaccard
        always (min <= union)."""
        from ml_hadoop_experiment_spark.operators.dedup import (
            minhash_dedup_pairs,
            minhash_overlap_pairs,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(200)
        ov = {(r["id_a"], r["id_b"]): (r["overlap"], r["jaccard"])
              for r in minhash_overlap_pairs(docs, "doc_id", "text",
                                             threshold=0.0).collect()}
        jc = {(r["id_a"], r["id_b"]): r["jaccard"]
              for r in minhash_dedup_pairs(docs, "doc_id", "text",
                                           threshold=0.0).collect()}
        assert set(ov) == set(jc) and ov
        for k, (o, j) in ov.items():
            assert j == jc[k]
            assert o >= j


class TestUnigramXent:
    def test_hand_computed_two_docs(self, spark):
        import math

        from ml_hadoop_experiment_spark.operators.corpus import unigram_xent

        # corpus: "a a b" + "b c" -> T=5, counts a=2 b=2 c=1
        df = spark.createDataFrame(
            [(1, "a a b"), (2, "b c")], "id long, t string"
        )
        out = {r["id"]: r for r in unigram_xent(df, "id", "t").collect()}
        lp = lambda c: round(math.log(c / 5), 6)
        x1 = round(-(2 * lp(2) + 1 * lp(2)) / 3, 6)
        x2 = round(-(lp(2) + lp(1)) / 2, 6)
        assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 2
        assert out[1]["xent"] == x1
        assert out[2]["xent"] == x2
        # the all-common-tokens doc is the lower-entropy one
        assert out[1]["xent"] < out[2]["xent"]

    def test_repeated_boilerplate_scores_below_gibberish(self, spark):
        from ml_hadoop_experiment_spark.operators.corpus import unigram_xent

        rows = [(i, "click here to subscribe now") for i in range(20)]
        rows.append((99, "qzx vbnm wkrt ploy jhgf"))
        df = spark.createDataFrame(rows, "id long, t string")
        out = {r["id"]: r["xent"] for r in unigram_xent(df, "id", "t").collect()}
        assert out[99] > out[0]


class TestPmiBigrams:
    def test_golden(self, spark):
        import math

        from ml_hadoop_experiment_spark.operators.corpus import pmi_bigrams

        # "a b" appears 3x; unigrams: a=5, b=4, c=2 (11); bigrams total = 8
        rows = [
            (1, "a b a b c"),   # bigrams: ab, ba, ab, bc
            (2, "a b c a"),     # bigrams: ab, bc, ca
            (3, "b a"),         # bigrams: ba
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = pmi_bigrams(df, "text", min_count=2, top_k=10).collect()
        got = {(r["w1"], r["w2"]): (r["n_pair"], r["pmi"]) for r in out}

        def pmi(cxy, cx, cy, tu=11, tb=8):
            return round(math.log((float(cxy) * tu * tu) / (float(tb) * cx * cy)), 6)

        assert got == {
            ("a", "b"): (3, pmi(3, 5, 4)),
            ("b", "a"): (2, pmi(2, 5, 4)),
            ("b", "c"): (2, pmi(2, 4, 2)),
        }
        # ordering: rarer-unigram pair (b,c) outranks (a,b)
        assert [(r["w1"], r["w2"]) for r in out][0] == ("b", "c")

    def test_min_count_prunes_and_short_docs_skip_bigrams(self, spark):
        from ml_hadoop_experiment_spark.operators.corpus import pmi_bigrams

        rows = [(1, "x y"), (2, "z"), (3, "  "), (4, "x y")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = pmi_bigrams(df, "text", min_count=2, top_k=10).collect()
        # only (x,y) survives; 1-token and blank docs emit no bigrams
        assert [(r["w1"], r["w2"], r["n_pair"]) for r in out] == [("x", "y", 2)]

    def test_topk_order_is_total(self, spark):
        from ml_hadoop_experiment_spark.operators.corpus import pmi_bigrams

        # two pairs with IDENTICAL pmi (symmetric counts) -> (w1, w2)
        # lexicographic tie-break decides who enters a k=1 cut
        rows = [(1, "p q p q"), (2, "s r s r")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = pmi_bigrams(df, "text", min_count=1, top_k=1).collect()
        assert len(out) == 1
        top = (out[0]["w1"], out[0]["w2"])
        full = pmi_bigrams(df, "text", min_count=1, top_k=100).collect()
        best = sorted(full, key=lambda r: (-r["pmi"], r["w1"], r["w2"]))[0]
        assert top == (best["w1"], best["w2"])


class TestBigramXent:
    def test_golden_tiny_corpus(self, spark):
        import math

        from ml_hadoop_experiment_spark.operators.corpus import bigram_xent

        rows = [(1, "a b a b"), (2, "a b c")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {r["id"]: (r["n_bigrams"], r["xent"])
               for r in bigram_xent(df, "doc_id", "text", lam=0.8).collect()}
        # corpus: unigrams a=3,b=3,c=1 (T=7); bigrams ab=3, ba=1, bc=1
        # left contexts: a->3, b->2
        T = 7.0

        def p(cb, c1, cu):
            return 0.8 * (cb / c1) + 0.2 * (cu / T)

        lp_ab = round(math.log(p(3, 3, 3)), 6)
        lp_ba = round(math.log(p(1, 2, 3)), 6)
        lp_bc = round(math.log(p(1, 2, 1)), 6)

        def xent(lps, n):
            # replicate the operator's decimal-sum + HALF_UP round
            # (Python's round() is banker's and differs at exact .5s)
            from decimal import ROUND_HALF_UP, Decimal

            s = sum(Decimal(f"{lp:.6f}") for lp in lps)
            v = Decimal(str(-float(s) / n))
            return float(v.quantize(Decimal("0.000001"), ROUND_HALF_UP))

        # doc1: ab x2, ba x1; doc2: ab x1, bc x1
        assert out[1] == (3, xent([lp_ab, lp_ab, lp_ba], 3))
        assert out[2] == (2, xent([lp_ab, lp_bc], 2))

    def test_word_order_sensitivity(self, spark):
        # the property unigram_xent lacks: a scrambled copy of fluent
        # text scores strictly higher (unigram stats identical)
        from ml_hadoop_experiment_spark.operators.corpus import (
            bigram_xent,
            unigram_xent,
        )

        fluent = "the model reads the data and the model writes the data"
        words = fluent.split()
        scrambled = " ".join(
            [words[i] for i in (7, 2, 9, 0, 5, 10, 3, 8, 1, 6, 4)]
        )
        corpus = [(i, fluent) for i in range(10)] + [(100, scrambled)]
        df = spark.createDataFrame(corpus, "doc_id bigint, text string")
        bx = {r["id"]: r["xent"] for r in bigram_xent(df, "doc_id", "text").collect()}
        ux = {r["id"]: r["xent"] for r in unigram_xent(df, "doc_id", "text").collect()}
        assert bx[100] > bx[0]          # bigram LM flags the scramble
        assert ux[100] == ux[0]         # unigram LM cannot

    def test_short_docs_drop(self, spark):
        from ml_hadoop_experiment_spark.operators.corpus import bigram_xent

        rows = [(1, "hello"), (2, ""), (3, "a b")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = bigram_xent(df, "doc_id", "text").collect()
        assert [r["id"] for r in out] == [3]


class TestOovRate:
    def test_hand_computed_coverage(self, spark):
        from ml_hadoop_experiment_spark.operators.corpus import oov_rate

        df = spark.createDataFrame([(1, "a a a b b c")], "id bigint, text string")
        # vocab 2 = {a, b}; oov instances = the one "c"
        assert tuple(oov_rate(df, "text", 2).collect()[0]) == (
            2, 2, 6, 1, 0.166667,
        )

    def test_tie_break_is_token_order(self, spark):
        from ml_hadoop_experiment_spark.operators.corpus import oov_rate

        # b and c tie at 2; vocab 2 = {a, b} (count desc, token asc)
        df = spark.createDataFrame([(1, "a a a b b c c")], "id bigint, text string")
        row = oov_rate(df, "text", 2).collect()[0]
        assert (row["n_oov"], row["oov_rate"]) == (2, 0.285714)

    def test_undersized_corpus_visible_not_silent(self, spark):
        from ml_hadoop_experiment_spark.operators.corpus import oov_rate

        df = spark.createDataFrame([(1, "a b c")], "id bigint, text string")
        row = oov_rate(df, "text", 100).collect()[0]
        assert (row["vocab_size"], row["n_vocab"], row["oov_rate"]) == (100, 3, 0.0)

    def test_matches_duckdb_twin(self, spark):
        import duckdb

        from ml_hadoop_experiment_spark.operators.corpus import (
            oov_rate,
            oov_rate_sql,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        s = tuple(oov_rate(docs, "text", 10).collect()[0])
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')"
        )
        d = con.execute(oov_rate_sql("documents", "text", 10)).fetchone()
        con.close()
        assert s == d

    def test_rejects_nonpositive_vocab(self, spark):
        import pytest as _pytest

        from ml_hadoop_experiment_spark.operators.corpus import oov_rate

        df = spark.createDataFrame([(1, "a")], "id bigint, text string")
        with _pytest.raises(ValueError, match="vocab_size"):
            oov_rate(df, "text", 0)
