"""KG schema operators (operators/schema.py): SHACL-style shape
validation, predicate schema induction, inverse-predicate detection —
against hand-computed values on tiny triple tables."""

import pytest

from phenobert_spark.operators.schema import (
    Shape,
    detect_inverse_predicates,
    infer_predicate_schema,
    validate_shapes,
)

SCHEMA = "subj string, pred string, obj string"


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(
        [
            ("c1", "placed", "o1"),
            ("c1", "placed", "o2"),
            ("c2", "placed", "o3"),
            ("s1", "located_in", "n1"),
            ("s2", "located_in", "nX"),  # nX not an approved nation
        ],
        SCHEMA,
    )


def test_min_count_needs_focus(spark, triples):
    with pytest.raises(ValueError):
        validate_shapes(triples, [Shape(pred="placed", min_count=1)]).collect()


def test_cardinality_violations(spark, triples):
    focus = spark.createDataFrame([("c1",), ("c2",), ("c3",)], "subj string")
    out = validate_shapes(
        triples, [Shape(pred="placed", min_count=1, max_count=1, focus=focus)]
    )
    rows = {(r.subj, r.constraint, r.detail) for r in out.collect()}
    # c3 has zero placed triples; c1 has two (> max 1); c2 conforms
    assert rows == {("c3", "min_count", "0"), ("c1", "max_count", "2")}


def test_obj_class_violation(spark, triples):
    approved = spark.createDataFrame([("n1",), ("n2",)], "obj string")
    out = validate_shapes(
        triples, [Shape(pred="located_in", obj_class=approved)]
    ).collect()
    assert len(out) == 1
    assert (out[0].subj, out[0].constraint, out[0].detail) == ("s2", "obj_class", "nX")


def test_obj_pattern_violation(spark, triples):
    out = validate_shapes(
        triples, [Shape(pred="placed", obj_pattern="o[0-9]+")]
    )
    assert out.count() == 0
    bad = validate_shapes(triples, [Shape(pred="located_in", obj_pattern="n[0-9]+")])
    assert [r.detail for r in bad.collect()] == ["nX"]


def test_shapes_reject_empty(spark, triples):
    with pytest.raises(ValueError):
        validate_shapes(triples, [])
    with pytest.raises(ValueError):
        validate_shapes(triples, [Shape(pred="placed")])


def test_predicate_schema_flags(spark, triples):
    out = {r.pred: r for r in infer_predicate_schema(triples).collect()}
    p = out["placed"]
    assert (p.n_triples, p.n_subj, p.n_obj, p.max_out, p.max_in) == (3, 2, 3, 2, 1)
    assert not p.is_functional and p.is_inverse_functional
    l = out["located_in"]
    assert l.is_functional and l.is_inverse_functional


def test_predicate_schema_dedups_triples(spark):
    t = spark.createDataFrame(
        [("a", "p", "x"), ("a", "p", "x"), ("a", "p", "y")], SCHEMA
    )
    row = infer_predicate_schema(t).collect()[0]
    assert (row.n_triples, row.max_out) == (2, 2)


def test_inverse_predicates_hand_computed(spark):
    t = spark.createDataFrame(
        [
            ("a", "p", "x"),
            ("b", "p", "y"),
            ("x", "q", "a"),  # full flip of (a,p,x)
            ("y", "q", "b"),  # full flip of (b,p,y)
            ("a", "r", "x"),  # r flips only one of p's two pairs
        ],
        SCHEMA,
    )
    out = {(r.pred_a, r.pred_b): r for r in detect_inverse_predicates(t, 0.0).collect()}
    assert out[("p", "q")].jaccard == 1.0
    assert out[("p", "q")].n_shared == 2
    # r shares 1 flipped pair with q: J = 1 / (2 + 1 - 1) = 0.5
    assert out[("q", "r")].jaccard == pytest.approx(0.5, abs=1e-6)
    # threshold filters
    assert set(detect_inverse_predicates(t, 0.9).toPandas()[["pred_a", "pred_b"]].itertuples(index=False, name=None)) == {("p", "q")}


def test_inverse_excludes_self_pairs(spark):
    # symmetric predicate: every pair flips onto the SAME predicate
    t = spark.createDataFrame([("a", "sym", "b"), ("b", "sym", "a")], SCHEMA)
    assert detect_inverse_predicates(t, 0.0).count() == 0
