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


GROUPED = [
    # (doc_id, domain, text) — "banner x" floods domain A (3 docs) but
    # appears once in domain B; "shared note" appears twice in EACH
    # domain (4 globally — cut ungrouped at max_docs=1? no: grouped
    # max_docs=1 cuts it per-domain too since 2 > 1; at max_docs=2 it
    # survives grouped but is cut ungrouped)
    (1, "a.com", "banner x\nbody one\nshared note"),
    (2, "a.com", "banner x\nbody two"),
    (3, "a.com", "banner x\nbody three\nshared note"),
    (4, "b.org", "banner x\nbody four\nshared note"),
    (5, "b.org", "body five\nshared note"),
    (6, "b.org", "body six"),
]


class TestGroupedBoilerplate:
    @pytest.fixture(scope="class")
    def gdocs(self, spark):
        return spark.createDataFrame(
            GROUPED, "doc_id int, domain string, text string"
        )

    def test_census_is_group_scoped(self, spark, gdocs):
        from ml_hadoop_experiment_spark.operators.lines import (
            repeated_lines,
        )

        rep = {
            (r["domain"], r["line"]): r["n_docs"]
            for r in repeated_lines(
                gdocs, "doc_id", "text", max_docs=2, group_col="domain"
            ).collect()
        }
        # banner x: 3 docs in a.com (> 2 -> flagged), 1 in b.org (not)
        assert rep == {("a.com", "banner x"): 3}

    def test_cut_is_group_scoped(self, spark, gdocs):
        from ml_hadoop_experiment_spark.operators.lines import (
            drop_repeated_lines,
        )

        out = {
            r["doc_id"]: (r["clean_text"], r["n_removed_lines"])
            for r in drop_repeated_lines(
                gdocs, "doc_id", "text", max_docs=2, group_col="domain"
            ).collect()
        }
        # banner x cut from a.com docs only; shared note (2 per domain,
        # 4 globally) survives everywhere under grouping
        assert out[1] == ("body one\nshared note", 1)
        assert out[2] == ("body two", 1)
        assert out[3] == ("body three\nshared note", 1)
        assert out[4] == ("banner x\nbody four\nshared note", 0)
        assert out[5] == ("body five\nshared note", 0)
        assert out[6] == ("body six", 0)
        # the same corpus UNGROUPED cuts banner x (4 docs) everywhere
        # and shared note (4 docs) too
        ung = {
            r["doc_id"]: r["n_removed_lines"]
            for r in drop_repeated_lines(
                gdocs, "doc_id", "text", max_docs=2
            ).collect()
        }
        assert ung == {1: 2, 2: 1, 3: 2, 4: 2, 5: 1, 6: 0}

    def test_duckdb_twin_grouped(self, spark, gdocs):
        from ml_hadoop_experiment_spark.operators.lines import (
            drop_repeated_lines,
            drop_repeated_lines_sql,
        )

        got = sorted(
            (r["doc_id"], r["clean_text"], r["n_removed_lines"])
            for r in drop_repeated_lines(
                gdocs, "doc_id", "text", max_docs=2, group_col="domain"
            ).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE g(doc_id INT, domain VARCHAR, text VARCHAR)"
        )
        con.executemany("INSERT INTO g VALUES (?, ?, ?)", GROUPED)
        sql = drop_repeated_lines_sql(
            "g", "doc_id", "text", max_docs=2,
            out_id="doc_id", group_expr="domain",
        )
        want = sorted(con.execute(sql).fetchall())
        assert got == want

    def test_ungrouped_sql_unchanged_by_group_param(self):
        from ml_hadoop_experiment_spark.operators.lines import (
            drop_repeated_lines_sql,
        )

        # the group_expr=None path must emit byte-identical SQL to the
        # pre-group-feature generator (line_dedup's recorded oracle)
        sql = drop_repeated_lines_sql("t", "id", "txt", max_docs=3)
        assert "grp" not in sql
        assert "USING (line)" in sql
