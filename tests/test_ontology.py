"""Ontology model: dictionary build, canonicalization, closure."""

import os

import pytest

from phenobert_spark.canonicalize import (
    canonicalize_ids,
    drop_redundant_ancestors,
    filter_abnormal,
)
from phenobert_spark.config import REFERENCE_ROOT
from phenobert_spark.ontology import ROOT, fixture_ontology, load_reference_ontology


def test_dictionary_keys(onto):
    # strict key keeps stopwords (reference parity, util.py:324-327)
    assert onto.phrase2hpo["abnormality body height of"] == "HP:0000002"
    # simplified key drops them (recall extension)
    assert onto.simple2hpo["abnormality body height"] == "HP:0000002"
    assert onto.phrase2hpo["seizure"] == "HP:0001250"


def test_ancestor_closure_multiparent(onto):
    anc = onto.ancestors()
    assert {"HP:L1_NEURO", "HP:L1_GROWTH", ROOT} <= anc["HP:0001531"]
    # deep chain: ataxia below seizure below L1
    assert "HP:0001250" in anc["HP:0001251"]


def test_canonicalize_alt_ids(spark, onto):
    df = spark.createDataFrame(
        [("d1", "HP:0008056"), ("d1", "HP:0001250"), ("d2", "HP:0001156")],
        "doc_id string, hpo_id string",
    )
    got = {
        (r.doc_id, r.hpo_id)
        for r in canonicalize_ids(df, spark, onto).collect()
    }
    assert got == {("d1", "HP:0001250"), ("d2", "HP:0001156")}


def test_filter_abnormal(spark, onto):
    df = spark.createDataFrame(
        [("d", "HP:0001250"), ("d", "HP:9999999"), ("d", ROOT)],
        "doc_id string, hpo_id string",
    )
    got = {r.hpo_id for r in filter_abnormal(df, spark, onto).collect()}
    assert got == {"HP:0001250"}  # root itself excluded (abnormalityNT)


def test_drop_redundant_ancestors(spark, onto):
    df = spark.createDataFrame(
        [("d", "HP:0001251"), ("d", "HP:0001250"), ("e", "HP:0001250")],
        "doc_id string, hpo_id string",
    )
    got = {(r.doc_id, r.hpo_id) for r in drop_redundant_ancestors(df, spark, onto).collect()}
    # doc d: seizure (HP:0001250) is an ancestor of ataxia -> dropped in d only
    assert got == {("d", "HP:0001251"), ("e", "HP:0001250")}


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_ROOT, "phenobert")),
    reason="reference checkout not present",
)
def test_reference_ontology_loads():
    onto = load_reference_ontology()
    assert len(onto.names) > 10000
    assert len(onto.layer1) == 25
    # every concept routed to at least one L1
    routed = set().union(*onto.layer1.values())
    assert len(routed & set(onto.names)) > 9000
    assert onto.phrase2hpo.get("kidneys multicystic") == "HP:0000003"
