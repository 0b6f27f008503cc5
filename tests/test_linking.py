"""Model-analog linking stages (M1-M4, linking/)."""

import numpy as np
import pytest

from phenobert_spark.config import PipelineConfig
from phenobert_spark.corpus import DOCUMENTS_SCHEMA
from phenobert_spark.linking.models import (
    ConceptIndex,
    HashedEncoder,
    RelaxedVocab,
    pair_score,
)
from phenobert_spark.pipeline import annotate


def test_encoder_deterministic_and_normalized():
    e1, e2 = HashedEncoder(), HashedEncoder()
    v1 = e1.encode(["short stature"])[0]
    v2 = e2.encode(["short stature"])[0]
    assert np.allclose(v1, v2)
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-5
    # token order independence (sorted-bag philosophy)
    assert np.allclose(v1, e1.encode(["stature short"])[0])


def test_encoder_similarity_ordering():
    enc = HashedEncoder()
    a = enc.encode(["mutilation"])[0]
    b = enc.encode(["mutilating"])[0]
    c = enc.encode(["cardiomyopathy"])[0]
    assert float(a @ b) > 0.5
    assert float(a @ b) > float(a @ c)


def test_pair_score_bidirectional(onto):
    idx = ConceptIndex.build(onto)
    enc = HashedEncoder(idx.dim)
    vec = enc.encode(["seizure"])[0]
    # exact surface -> 1.0
    assert pair_score(enc, "seizure", vec, "HP:0001250", idx) == pytest.approx(1.0)
    # morphological variant scores high; unrelated concept scores low
    v2 = enc.encode(["seizures severe"])[0]
    hi = pair_score(enc, "epileptic seizures", v2, "HP:0001250", idx)
    lo = pair_score(enc, "epileptic seizures", v2, "HP:0001156", idx)
    assert hi > 0.7 > lo


def test_relaxed_vocab(onto):
    rv = RelaxedVocab(onto.vocab())
    assert "seizure" in rv
    assert "seizures" in rv       # lemma
    assert "seizuring" in rv      # 5-char prefix
    assert "xylophone" not in rv


def test_model_stage_catches_morphological_variant(spark, onto):
    """'mutilating'-style variants: dictionary misses, model stage hits."""
    rows = [
        ("t", "a.txt", "0" * 40, "en",
         "patient with craniosynostosic skull, stable visit."),
        ("t", "b.txt", "0" * 40, "en", "routine followup, nothing acute."),
    ]
    docs = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    dict_only = annotate(spark, docs, onto, PipelineConfig())
    with_model = annotate(
        spark, docs, onto, PipelineConfig(use_model_stages=True)
    )
    d = {r.hpo_id for r in dict_only.collect()}
    m = {r.hpo_id for r in with_model.collect()}
    assert "HP:0001363" not in d          # craniosynostosis not exact-matched
    assert "HP:0001363" in m              # model stage links the variant
    assert m >= d                          # model stage only adds


def test_gcn_ancestor_smoothing(onto):
    """GCN-analog smoothing (util.py:540-575 on the rebuilt 2-level
    DAG): concept vectors move toward their L1-parent centroid, stay
    unit-norm, and routing membership is unchanged."""
    import numpy as np

    from phenobert_spark.linking.models import ConceptIndex

    base = ConceptIndex.build(onto, gcn_lambda=0.0)
    sm = ConceptIndex.build(onto, gcn_lambda=0.4)
    assert base.concept_ids == sm.concept_ids
    assert np.array_equal(base.concept_l1, sm.concept_l1)
    norms = np.linalg.norm(sm.concept_mat, axis=1)
    nz = norms > 0
    assert np.allclose(norms[nz], 1.0, atol=1e-5)
    moved = 0
    for i, cid in enumerate(base.concept_ids):
        parents = np.nonzero(base.concept_l1[i])[0]
        if len(parents) == 0 or len(parents) == len(base.l1_ids):
            continue
        anc = base.l1_mat[parents].mean(axis=0)
        if np.linalg.norm(anc) == 0 or norms[i] == 0:
            continue
        before = float(base.concept_mat[i] @ anc)
        after = float(sm.concept_mat[i] @ anc)
        if after > before:
            moved += 1
    assert moved > 0  # smoothing pulled concepts toward their subtree
