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
