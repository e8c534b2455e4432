"""Line-level cross-document dedup: normalization key, blank-line
exemption, fully-cut documents, NULL passthrough, the DuckDB twin, and
the corpus-never-shuffles plan shape."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

CORPUS = [
    (1, "unique alpha\nCOPYRIGHT FOOTER\nbody one\n\nmore one"),
    (2, "body two\n  copyright footer  \nunique beta"),
    (3, "copyright footer\nbody three"),
    (4, None),
    (5, "only original content\n\n"),
    (6, "copyright footer"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id int, text string")


class TestDropRepeatedLines:
    def test_census_and_cleaned_corpus(self, spark, docs):
        from ml_hadoop_experiment_spark.operators.lines import (
            drop_repeated_lines,
            repeated_lines,
        )

        rep = {
            r["line"]: r["n_docs"]
            for r in repeated_lines(docs, "doc_id", "text").collect()
        }
        # case/whitespace variants collapse onto one normalized key;
        # blank lines never enter the census
        assert rep == {"copyright footer": 4}
        got = {
            r["doc_id"]: (r["clean_text"], r["n_removed_lines"])
            for r in drop_repeated_lines(docs, "doc_id", "text").collect()
        }
        assert got[1] == ("unique alpha\nbody one\n\nmore one", 1)
        assert got[2] == ("body two\nunique beta", 1)
        assert got[3] == ("body three", 1)
        assert got[4][0] is None and got[4][1] == 0
        # blank lines survive untouched
        assert got[5] == ("only original content\n\n", 0)
        # fully-cut document keeps the empty string
        assert got[6] == ("", 1)

    def test_max_docs_threshold_and_no_normalize(self, spark, docs):
        from ml_hadoop_experiment_spark.operators.lines import (
            repeated_lines,
        )

        # threshold above the footer's document frequency: nothing cut
        assert (
            repeated_lines(docs, "doc_id", "text", max_docs=4).count() == 0
        )
        # normalize=False: the three case/space variants stay distinct,
        # only the exact-equal pair (docs 3 and 6) crosses max_docs=1
        rep = {
            r["line"]
            for r in repeated_lines(
                docs, "doc_id", "text", normalize=False
            ).collect()
        }
        assert rep == {"copyright footer"}

    def test_duckdb_twin(self, spark, docs):
        from ml_hadoop_experiment_spark.operators.lines import (
            drop_repeated_lines,
            drop_repeated_lines_sql,
        )

        sp = (
            drop_repeated_lines(docs, "doc_id", "text")
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register(
            "corpus", pd.DataFrame(CORPUS, columns=["doc_id", "text"])
        )
        du = (
            con.execute(
                drop_repeated_lines_sql(
                    "corpus", "doc_id", "text", out_id="doc_id"
                )
            )
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for c in ["doc_id", "clean_text", "n_removed_lines"]:
            assert list(sp[c].astype(str)) == list(du[c].astype(str)), c

    def test_corpus_payload_broadcast_not_shuffled(self, spark, docs):
        from ml_hadoop_experiment_spark.operators.lines import (
            drop_repeated_lines,
        )
        from ml_hadoop_experiment_spark.plans.optimize import (
            executed_plan_str,
        )

        plan = executed_plan_str(
            drop_repeated_lines(docs, "doc_id", "text")
        )
        assert "BroadcastExchange" in plan or "BroadcastQueryStage" in plan


PARA_CORPUS = [
    # banner repeats in 1/2/3 (indent + case variants of one block);
    # footer block spans TWO lines and repeats in 1 and 3; bodies unique
    (1, "SIGN UP\nfor our newsletter\n\nbody one\n \nfooter a\nfooter b"),
    (2, "  sign   up\nfor our newsletter\n\n\nbody two"),
    (3, "sign up for\nour newsletter\n\nbody three\n\nFooter A\n  footer B"),
    (4, None),
    (5, "only original paragraphs\n\n"),
    (6, "body six"),
]


@pytest.fixture(scope="module")
def para_docs(spark):
    return spark.createDataFrame(PARA_CORPUS, "doc_id int, text string")


class TestDropRepeatedParagraphs:
    def test_census_collapses_whitespace_and_case(self, spark, para_docs):
        from ml_hadoop_experiment_spark.operators.lines import (
            repeated_paragraphs,
        )

        rep = {
            r["paragraph"]: r["n_docs"]
            for r in repeated_paragraphs(
                para_docs, "doc_id", "text"
            ).collect()
        }
        # doc 1/2's banner ("SIGN UP\nfor..." vs "  sign   up\nfor...")
        # collapses to one key; doc 3's banner WRAPS differently but
        # collapses to the same key too (internal \n is whitespace);
        # the two-line footer block repeats in 1 and 3
        assert rep == {
            "sign up for our newsletter": 3,
            "footer a footer b": 2,
        }

    def test_cleaned_corpus(self, spark, para_docs):
        from ml_hadoop_experiment_spark.operators.lines import (
            drop_repeated_paragraphs,
        )

        got = {
            r["doc_id"]: (r["clean_text"], r["n_removed_paragraphs"])
            for r in drop_repeated_paragraphs(
                para_docs, "doc_id", "text"
            ).collect()
        }
        assert got[1] == ("body one", 2)
        assert got[2] == ("body two", 1)
        assert got[3] == ("body three", 2)
        assert got[4] == (None, 0)
        # trailing blank split pieces are exempt and survive the rejoin
        assert got[5] == ("only original paragraphs\n\n", 0)
        assert got[6] == ("body six", 0)

    def test_duckdb_twin_matches(self, spark, para_docs):
        from ml_hadoop_experiment_spark.operators.lines import (
            drop_repeated_paragraphs,
            drop_repeated_paragraphs_sql,
        )

        sp = (
            drop_repeated_paragraphs(para_docs, "doc_id", "text")
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register(
            "corpus", pd.DataFrame(PARA_CORPUS, columns=["doc_id", "text"])
        )
        du = (
            con.execute(
                drop_repeated_paragraphs_sql(
                    "corpus", "doc_id", "text", out_id="doc_id"
                )
            )
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for c in ["doc_id", "clean_text", "n_removed_paragraphs"]:
            assert list(sp[c].astype(str)) == list(du[c].astype(str)), c
