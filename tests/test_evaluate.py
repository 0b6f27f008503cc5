"""Metric math (reference eval_all.py:60-73 calc_metric semantics)."""

from phenobert_spark.evaluate import evaluate_sets


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, hpo_id string")


def test_micro_macro(spark, onto):
    pred = _df(spark, [("d1", "HP:0001250"), ("d1", "HP:0001249"), ("d2", "HP:0001156")])
    gold = _df(spark, [("d1", "HP:0001250"), ("d2", "HP:0001156"), ("d2", "HP:0002650")])
    m = evaluate_sets(spark, pred, gold, onto)
    # micro: tp=2, pred=3, gold=3
    assert abs(m["micro_p"] - 2 / 3) < 1e-9
    assert abs(m["micro_r"] - 2 / 3) < 1e-9
    # macro: d1 P=0.5 R=1, d2 P=1 R=0.5
    assert abs(m["macro_p"] - 0.75) < 1e-9
    assert abs(m["macro_r"] - 0.75) < 1e-9


def test_empty_doc_rule(spark, onto):
    """Doc with no gold and no pred counts P=R=1 (eval_all.py:64-67)."""
    universe = spark.createDataFrame([("d1",), ("d2",)], "doc_id string")
    pred = _df(spark, [("d1", "HP:0001250")])
    gold = _df(spark, [("d1", "HP:0001250")])
    m = evaluate_sets(spark, pred, gold, onto, doc_universe=universe)
    assert m["macro_p"] == 1.0 and m["macro_r"] == 1.0


def test_alt_id_folding_in_eval(spark, onto):
    pred = _df(spark, [("d1", "HP:0008056")])  # alt id of HP:0001250
    gold = _df(spark, [("d1", "HP:0001250")])
    m = evaluate_sets(spark, pred, gold, onto)
    assert m["micro_p"] == 1.0 and m["micro_r"] == 1.0


def test_non_abnormal_ids_excluded(spark, onto):
    pred = _df(spark, [("d1", "HP:0001250"), ("d1", "HP:7777777")])
    gold = _df(spark, [("d1", "HP:0001250")])
    m = evaluate_sets(spark, pred, gold, onto)
    assert m["micro_p"] == 1.0


def test_evaluate_report_format(spark, onto):
    """Three-section multi-tool report in the reference's eval_all
    format (eval_all.py:260-321)."""
    from phenobert_spark.evaluate import evaluate_report

    gold = spark.createDataFrame(
        [("d1", "HP:0001250"), ("d1", "HP:0001249"), ("d2", "HP:0002315")],
        "doc_id string, hpo_id string",
    )
    tool_a = spark.createDataFrame(
        [("d1", "HP:0001250"), ("d2", "HP:0002315")],
        "doc_id string, hpo_id string",
    )
    tool_b = spark.createDataFrame(
        [("d1", "HP:0001251")], "doc_id string, hpo_id string"
    )
    rep = evaluate_report(
        spark, {"EngineA": tool_a, "EngineB": tool_b}, gold, onto
    )
    lines = rep.splitlines()
    assert lines[0] == "Evaluate in Micro Way"
    assert "Evaluate in Macro Way" in lines
    assert "Evaluate in Node Similarity Way" in lines
    assert any(l.startswith("EngineA Precision: 1.0000") for l in lines)
    assert sum("Similarity:" in l for l in lines) == 2
