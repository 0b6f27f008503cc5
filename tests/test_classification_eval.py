import math

from phenobert_spark.operators.classification_eval import (
    cohen_kappa,
    roc_auc,
)


def _auc(spark, rows):
    df = spark.createDataFrame(rows, "y int, s double")
    return roc_auc(df, "y", "s").collect()[0]


def test_auc_perfect_and_reversed(spark):
    r = _auc(spark, [(0, 1.0), (0, 2.0), (1, 3.0), (1, 4.0)])
    assert r.auc == 1.0 and r.n_pos == 2 and r.n_neg == 2
    r = _auc(spark, [(1, 1.0), (1, 2.0), (0, 3.0), (0, 4.0)])
    assert r.auc == 0.0


def test_auc_all_tied_is_half(spark):
    r = _auc(spark, [(0, 5.0), (1, 5.0), (0, 5.0), (1, 5.0)])
    assert r.auc == 0.5
    assert r.n_distinct_scores == 1


def test_auc_hand_computed_with_ties(spark):
    # scores: neg@1, pos&neg tied @2, pos@3
    # pairs: pos2 vs neg1 -> 1; pos2 vs neg2 -> 0.5; pos3 beats both.
    # AUC = (1 + 0.5 + 1 + 1) / 4 = 0.875
    r = _auc(spark, [(0, 1.0), (1, 2.0), (0, 2.0), (1, 3.0)])
    assert math.isclose(r.auc, 0.875)


def test_auc_matches_sklearn_formula_brute(spark):
    # brute-force pair count on a slightly larger deterministic set
    rows = [((i * 7) % 3 == 0, float((i * i) % 11)) for i in range(40)]
    rows = [(int(y), s) for y, s in rows]
    pos = [s for y, s in rows if y]
    neg = [s for y, s in rows if not y]
    wins = sum(
        1.0 if p > q else (0.5 if p == q else 0.0)
        for p in pos
        for q in neg
    )
    expect = wins / (len(pos) * len(neg))
    r = _auc(spark, rows)
    assert math.isclose(r.auc, round(expect, 6), abs_tol=1e-9)
    assert r.n_pos == len(pos) and r.n_neg == len(neg)


def test_kappa_hand_computed(spark):
    # classic 2x2: 20 items, a/b agree on 15 (10 yes, 5 no)
    rows = (
        [("y", "y")] * 10
        + [("n", "n")] * 5
        + [("y", "n")] * 3
        + [("n", "y")] * 2
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    po = 15 / 20
    pe = (13 / 20) * (12 / 20) + (7 / 20) * (8 / 20)
    assert math.isclose(r.p_observed, round(po, 6))
    assert math.isclose(r.p_expected, round(pe, 6))
    assert math.isclose(r.kappa, round((po - pe) / (1 - pe), 6))
    assert r.n_items == 20


def test_kappa_perfect_agreement_is_one(spark):
    rows = [("a", "a"), ("b", "b"), ("c", "c"), ("a", "a")]
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert r.kappa == 1.0


def test_kappa_degenerate_constant_raters_null(spark):
    rows = [("x", "x")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert r.kappa is None and r.p_expected == 1.0


def test_kappa_disjoint_label_spaces(spark):
    # raters never use the same label -> p_o = 0, p_e = 0, kappa = 0
    rows = [("a", "b"), ("a", "c"), ("d", "b")]
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert r.kappa == 0.0 and r.p_expected == 0.0
