"""Semi-structured (JSON) column extraction.

Web-scale event and crawl tables carry a schemaless JSON "properties"
string next to the typed columns (the sandbox `events` table models it
as ``props``: ``'{"k": 69}'``). The engine's job is to turn that
string into typed columns ONCE, JVM-side, and let every downstream
operator work on ordinary columns — never to re-parse per use and
never to ship raw JSON through a shuffle.

Scale notes: :func:`parse_json_props` is a narrow projection (one
``from_json`` per row, whole-stage codegen, no UDF, no shuffle); the
raw JSON string is dropped in the same projection, so an aggregation
over an extracted field shuffles only the typed columns. Malformed
rows parse to NULL rather than failing the job — at 10^12 rows some
rows ARE malformed, and a scrub pass must quarantine, not crash.

Reference parity: the reference engine has no semi-structured input
(documents arrive as plain text, `phenobert/utils/util.py:433-447`
reads whole files); this module is part of the training-data-pipeline
surface the brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_json_props(
    df: DataFrame,
    json_col: str = "props",
    schema_ddl: str = "k INT",
    keep: list[str] | None = None,
) -> DataFrame:
    """Parse a JSON-string column into typed top-level columns.

    One ``from_json`` per row (single parse regardless of how many
    fields the schema pulls), fields hoisted to top level, the raw
    string dropped. ``keep`` limits the carried-through columns so the
    projection prunes at the scan.
    """
    cols = keep if keep is not None else [c for c in df.columns if c != json_col]
    parsed = F.from_json(F.col(json_col), schema_ddl).alias("_j")
    return df.select(*cols, parsed).select(*cols, "_j.*")


def props_rollup(
    df: DataFrame,
    json_col: str = "props",
    field: str = "k",
    field_type: str = "INT",
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Aggregate an extracted JSON field per group: the canonical
    "schema-on-read analytics" pass (count, sum/avg of the JSON field,
    avg of a typed sibling column).

    Plan: parse-project → one hash aggregate. The combiner runs
    map-side, so the shuffle carries one row per (partition, group).
    """
    typed = parse_json_props(
        df, json_col, f"{field} {field_type}", keep=[group_col, value_col]
    )
    return (
        typed.groupBy(group_col)
        .agg(
            F.count("*").alias("n_events"),
            F.count(field).alias("n_with_field"),
            F.sum(field).alias(f"sum_{field}"),
            F.round(F.avg(field), 6).alias(f"avg_{field}"),
            F.round(F.avg(value_col), 6).alias(f"avg_{value_col}"),
        )
        .orderBy(group_col)
    )
