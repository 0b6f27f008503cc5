"""Golden corpus regression (reference GSC+ / ID-68 gold annotations).

These are regression FLOORS for the deterministic dictionary path
(measured at commit time; the model-analog stages raise recall on top).
The reference itself cannot execute in this sandbox (weights are
missing blobs), so gold ``ann/`` is the oracle — the same oracle
eval_all.py uses (SURVEY.md §5).
"""

import os

import pytest

from phenobert_spark.config import REFERENCE_ROOT, PipelineConfig
from phenobert_spark.corpus import (
    load_reference_corpus,
    load_reference_gold,
    with_doc_id,
)
from phenobert_spark.evaluate import evaluate_sets
from phenobert_spark.ontology import load_reference_ontology
from phenobert_spark.pipeline import annotate

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_ROOT, "phenobert")),
    reason="reference checkout not present",
)

# Floors measured on the dictionary-only path (see BENCH/BASELINE.md).
# Round-3 measured (round-2 levers + 'both'/'that' clause-break
# exemptions, tools/punkt_parity.py):
# GSC+ 0.831/0.665/0.739, ID-68 0.939/0.734/0.824,
# GeneReviews 0.921/0.786/0.848, val 0.869/0.768/0.815.
# Each floor sits ~1pt under its measurement so a quality-neutral
# lever can't trip the gate on noise.
FLOORS = {
    "GSC+": {"micro_p": 0.82, "micro_r": 0.655, "micro_f1": 0.73},
    "ID-68": {"micro_p": 0.93, "micro_r": 0.725, "micro_f1": 0.815},
    "GeneReviews": {"micro_p": 0.91, "micro_r": 0.775, "micro_f1": 0.84},
    "val": {"micro_p": 0.86, "micro_r": 0.755, "micro_f1": 0.81},
}


@pytest.fixture(scope="module")
def ref_onto():
    return load_reference_ontology()


@pytest.mark.parametrize("dataset", ["GSC+", "ID-68", "GeneReviews", "val"])
def test_golden_floors(spark, ref_onto, dataset):
    docs = load_reference_corpus(spark, dataset)
    docs_id = with_doc_id(docs)
    gold = (
        load_reference_gold(spark, dataset)
        .withColumnRenamed("doc_id", "path")
        .join(docs_id.select("path", "doc_id"), on="path")
        .drop("path")
    )
    triples = annotate(spark, docs, ref_onto, PipelineConfig())
    m = evaluate_sets(
        spark, triples, gold, ref_onto, doc_universe=docs_id.select("doc_id")
    )
    floors = FLOORS[dataset]
    for k, floor in floors.items():
        assert m[k] >= floor, f"{dataset} {k}={m[k]:.4f} < floor {floor} ({m})"
