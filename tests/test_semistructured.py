"""Semi-structured JSON extraction + PII scrubbing."""

from pyspark.sql import functions as F

from phenobert_spark.operators.semistructured import (
    parse_json_props,
    props_rollup,
)
from phenobert_spark.operators.text import pii_redact


def test_parse_json_props_typed_and_null_on_malformed(spark):
    df = spark.createDataFrame(
        [
            (1, "a", '{"k": 7}'),
            (2, "a", '{"k": null}'),
            (3, "b", "not json at all"),
            (4, "b", None),
        ],
        "id INT, grp STRING, props STRING",
    )
    out = parse_json_props(df, "props", "k INT")
    rows = {r["id"]: r["k"] for r in out.collect()}
    assert rows == {1: 7, 2: None, 3: None, 4: None}
    assert "props" not in out.columns  # raw JSON dropped in the projection


def test_props_rollup_counts_and_sums(spark):
    df = spark.createDataFrame(
        [
            (1, "click", 1.0, '{"k": 2}'),
            (2, "click", 3.0, '{"k": 4}'),
            (3, "click", 5.0, "broken{"),
            (4, "view", 2.0, '{"k": 10}'),
        ],
        "event_id INT, event_type STRING, value DOUBLE, props STRING",
    )
    out = {r["event_type"]: r for r in props_rollup(df).collect()}
    c = out["click"]
    assert (c["n_events"], c["n_with_field"], c["sum_k"]) == (3, 2, 6)
    assert c["avg_k"] == 3.0 and c["avg_value"] == 3.0
    v = out["view"]
    assert (v["n_events"], v["n_with_field"], v["sum_k"]) == (1, 1, 10)


def test_pii_redact_scrubs_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-1.org and d@e.io from 10.0.255.7 done"),
            (2, "no pii here"),
            (3, "ip only 192.168.1.1"),
        ],
        "doc_id INT, text STRING",
    )
    rows = {r["doc_id"]: r for r in pii_redact(df).collect()}
    assert rows[1]["redacted"] == "mail <EMAIL> and <EMAIL> from <IP> done"
    assert (rows[1]["n_emails"], rows[1]["n_ips"]) == (2, 1)
    assert rows[2]["redacted"] == "no pii here"
    assert (rows[2]["n_emails"], rows[2]["n_ips"]) == (0, 0)
    assert rows[3]["redacted"] == "ip only <IP>"
    assert (rows[3]["n_emails"], rows[3]["n_ips"]) == (0, 1)


def test_pii_redact_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "x@y.zz")], "doc_id INT, text STRING")
    plan = pii_redact(df)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Exchange" not in plan
