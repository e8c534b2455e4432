"""Quality-rule audit: crafted per-rule goldens, NULL contract, report
arithmetic, and the row-level/report consistency."""

from __future__ import annotations

from pyspark.sql import functions as F


def _crafted(spark):
    rows = [
        (1, None),  # NULL fails everything
        (2, "tiny doc"),  # too few words
        (3, "the of and to in is that it you a normal sentence here ok fine"),
        (4, "1234 5678 9999 0000 1111 the of"),  # digit-heavy
        (5, "### $$$ %%% ^^^ &&& the of"),  # symbol-heavy
        (6, "a b c d e f g h i j"),  # 1-char words -> mean length out
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestQualityRules:
    def test_crafted_flags(self, spark):
        from ml_hadoop_experiment_spark.operators.rules import (
            apply_quality_rules,
        )

        out = apply_quality_rules(_crafted(spark), "text")
        by_id = {r["doc_id"]: r for r in out.collect()}
        assert by_id[1]["rules_pass"] is False
        assert all(
            by_id[1][c] for c in out.columns if c.startswith("rule_")
        )  # NULL fails every rule
        assert by_id[2]["rule_too_few_words"]
        assert by_id[3]["rules_pass"] is True
        assert by_id[4]["rule_high_digit_ratio"]
        assert by_id[5]["rule_high_symbol_ratio"]
        assert by_id[6]["rule_mean_word_len_out"]

    def test_report_matches_row_level_flags(self, spark):
        from ml_hadoop_experiment_spark.operators.rules import (
            apply_quality_rules,
            quality_rules_report,
        )

        df = _crafted(spark)
        flags = apply_quality_rules(df, "text")
        report = {
            r["rule"]: (r["n_fail"], r["frac_fail"])
            for r in quality_rules_report(df, "text").collect()
        }
        n = df.count()
        for col in [c for c in flags.columns if c.startswith("rule_")]:
            n_fail = flags.where(F.col(col)).count()
            assert report[col[len("rule_"):]] == (
                n_fail,
                round(n_fail / n, 6),
            )
        n_any = flags.where(~F.col("rules_pass")).count()
        assert report["any_rule"] == (n_any, round(n_any / n, 6))

    def test_matches_duckdb_twin(self, spark):
        import duckdb

        from ml_hadoop_experiment_spark.operators.rules import (
            quality_rules_report,
            quality_rules_report_sql,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        s = sorted(map(tuple, quality_rules_report(docs, "text").collect()))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')"
        )
        d = sorted(
            map(
                tuple,
                con.execute(
                    quality_rules_report_sql("documents", "text")
                ).fetchall(),
            )
        )
        con.close()
        assert s == d

    def test_vertical_tab_agrees_across_engines(self, spark):
        """Java's \\s includes \\x0B, RE2's does not — the explicit
        whitespace class must make both engines count the SAME symbols
        for text containing a vertical tab."""
        import duckdb

        from ml_hadoop_experiment_spark.operators.rules import (
            quality_rules_report,
            quality_rules_report_sql,
        )

        rows = [
            (1, "plain text\x0bwith a vertical tab the of and ###"),
            (2, "$$$\x0b$$$ \x0b symbols around tabs the of"),
        ]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        s = sorted(map(tuple, quality_rules_report(docs, "text").collect()))
        con = duckdb.connect()
        con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
        d = sorted(
            map(
                tuple,
                con.execute(
                    quality_rules_report_sql("docs", "text")
                ).fetchall(),
            )
        )
        con.close()
        assert s == d
