"""Blocked fuzzy matching (entity resolution) tests."""

import pytest

from ml_hadoop_experiment_spark.operators.entity import blocked_fuzzy_pairs


@pytest.fixture(scope="module")
def records(spark):
    rows = [
        (1, "acme corp", "US"),
        (2, "acme corp.", "US"),    # distance 1 from id 1
        (3, "acme korp", "US"),     # distance 1 from id 1, 2 from id 2
        (4, "acme corp", "DE"),     # identical text, different block
        (5, "zenith ltd", "US"),    # far from everything
    ]
    return spark.createDataFrame(rows, "id long, name string, country string")


def test_pairs_within_block_and_distance(records):
    out = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in blocked_fuzzy_pairs(
            records, "id", "name", ["country"], max_distance=2
        ).collect()
    }
    assert out[(1, 2)] == 1
    assert out[(1, 3)] == 1
    assert out[(2, 3)] == 2
    # different block: never compared, even though identical
    assert not any(4 in pair for pair in out)
    # beyond the distance cap
    assert not any(5 in pair for pair in out)


def test_each_pair_once_ordered(records):
    out = blocked_fuzzy_pairs(records, "id", "name", ["country"], 2).collect()
    assert all(r["id_a"] < r["id_b"] for r in out)
    assert len(out) == len({(r["id_a"], r["id_b"]) for r in out})


def test_requires_blocking(records):
    with pytest.raises(ValueError):
        blocked_fuzzy_pairs(records, "id", "name", [], 2)


def test_duplicated_spellings_pair_exactly_once(spark):
    # 3 records of one spelling + 2 of a 1-edit variant in one block:
    # C(5,2) = 10 pairs, each exactly once, distances by spelling pair
    rows = [
        (1, "acme", "US"),
        (2, "acme", "US"),
        (3, "acme", "US"),
        (4, "acm", "US"),
        (5, "acm", "US"),
    ]
    df = spark.createDataFrame(rows, "id long, name string, country string")
    out = blocked_fuzzy_pairs(df, "id", "name", ["country"], max_distance=2)
    pairs = {(r["id_a"], r["id_b"]): r["distance"] for r in out.collect()}
    assert len(pairs) == 10
    assert pairs[(1, 2)] == 0 and pairs[(4, 5)] == 0
    assert pairs[(1, 4)] == 1 and pairs[(3, 5)] == 1
    assert all(a < b for a, b in pairs)


def test_sorted_neighborhood_window_exact(spark):
    from ml_hadoop_experiment_spark.operators.entity import (
        sorted_neighborhood_pairs,
    )

    # 12 records in known sort order; window 3 -> pairs iff rank gap <= 3
    rows = [(i, f"name_{i:02d}") for i in range(12)]
    df = spark.createDataFrame(rows, "id long, name string")
    out = sorted_neighborhood_pairs(df, "id", ["name"], window=3).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    expected = {
        (i, j) for i in range(12) for j in range(12) if 0 < j - i <= 3
    }
    assert got == expected
    # ranks are the 1-based sort positions
    ranks = {r["id_a"]: r["rank_a"] for r in out}
    assert ranks[0] == 1 and ranks[5] == 6
    # linear candidate bound: each record pairs with <= 2*window others
    from collections import Counter

    deg = Counter()
    for a, b in got:
        deg[a] += 1
        deg[b] += 1
    assert max(deg.values()) <= 6
