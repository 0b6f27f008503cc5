"""Blocked ER matching + deterministic KG negative sampling
(operators/entity_resolution.py) against hand-computed values."""

import hashlib

import pyspark.sql.functions as F
import pytest

from phenobert_spark.operators.entity_resolution import (
    blocked_matches,
    negative_sample_triples,
)

ROWS = [
    # (id, name, brand)
    (1, "small ring", "B1"),
    (2, "small rings", "B1"),   # lev 1 from id 1, same block
    (3, "small rod", "B1"),     # lev 3 from "small ring" -> above max_edit
    (4, "small ring", "B2"),    # exact dup name but different brand block
    (5, "large ring", "B1"),    # different first token -> different block
    (6, "small ringo", "B1"),   # lev 1 from id 1, lev 2 from id 2
]


@pytest.fixture(scope="module")
def parts(spark):
    return spark.createDataFrame(ROWS, "id bigint, name string, brand string")


def _pairs(df):
    return {(r.id_a, r.id_b): (r.edit_dist, r.sim) for r in df.collect()}


def test_blocked_matches_hand_computed(spark, parts):
    out = blocked_matches(
        parts,
        id_col="id",
        name_col="name",
        block_cols=[F.col("brand"), F.substring_index(F.col("name"), " ", 1)],
        max_edit=2,
    )
    got = _pairs(out)
    # block (B1, "small") holds ids {1,2,3,6}; (B2,"small")={4}; (B1,"large")={5}
    assert set(got) == {(1, 2), (1, 6), (2, 6)}
    assert got[(1, 2)][0] == 1           # ring -> rings
    assert got[(1, 6)][0] == 1           # ring -> ringo
    assert got[(2, 6)][0] == 1           # rings -> ringo (s->o)
    # sim = 1 - dist / max(len): (1,2) -> 1 - 1/11
    assert got[(1, 2)][1] == pytest.approx(1 - 1 / 11, abs=1e-6)


def test_blocked_matches_max_block_size_drops_hot_block(spark, parts):
    out = blocked_matches(
        parts,
        id_col="id",
        name_col="name",
        block_cols=[F.col("brand"), F.substring_index(F.col("name"), " ", 1)],
        max_edit=2,
        max_block_size=3,
    )
    # the 4-row (B1, "small") block is dropped entirely
    assert out.count() == 0


TRIPLES = [(h, "r", t) for h, t in [(1, 10), (1, 20), (2, 20), (3, 30)]]


def _expected_neg(head, rel, tail, ents, salt):
    n = len(ents)
    h = int(
        hashlib.md5(f"{head}|{rel}|{tail}|{salt}".encode()).hexdigest()[:8], 16
    ) % (n - 1)
    tidx = ents.index(tail)
    return ents[h + 1 if h >= tidx else h]


def test_negative_sample_matches_python_twin(spark):
    df = spark.createDataFrame(TRIPLES, "head bigint, rel string, tail bigint")
    out = {
        (r.head, r.tail): r.neg_tail
        for r in negative_sample_triples(df, salt="s").collect()
    }
    ents = [10, 20, 30]
    assert len(out) == len(TRIPLES)
    for head, rel, tail in TRIPLES:
        exp = _expected_neg(head, rel, tail, ents, "s")
        assert out[(head, tail)] == exp
        assert out[(head, tail)] != tail  # never the true tail


def test_negative_sample_requires_two_entities(spark):
    df = spark.createDataFrame(
        [(1, "r", 10), (2, "r", 10)], "head bigint, rel string, tail bigint"
    )
    with pytest.raises(Exception, match="2 distinct tail entities"):
        negative_sample_triples(df).collect()
