"""First-class dedup operators (operators/dedup.py)."""

import pyspark.sql.functions as F

from phenobert_spark.operators.dedup import (
    exact_dedup,
    hamming_neighbors,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
)

ROWS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
    (3, "the quick brown fox jumps over a lazy dog today"),      # near dup of 1
    (4, "completely different content about spark shuffles"),
    (5, "completely different content about spark shuffles"),    # exact dup of 4
    (6, "unrelated words entirely separate topic here now"),
]


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id int, text string")


def test_exact_dedup(spark):
    out = exact_dedup(_docs(spark))
    ids = {r.doc_id for r in out.collect()}
    assert ids == {1, 3, 4, 6}  # smallest id survives per hash group


def test_minhash_identical_signatures(spark):
    sig = minhash_signatures(_docs(spark)).collect()
    by_id = {r.doc_id: (r.mh1, r.mh2, r.mh3, r.mh4) for r in sig}
    assert by_id[1] == by_id[2]           # identical text -> identical sig
    assert by_id[1] != by_id[6]
    shared = sum(a == b for a, b in zip(by_id[1], by_id[3]))
    assert shared >= 1                     # near dup shares some minhashes


def test_lsh_pairs_contain_duplicates(spark):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(minhash_signatures(_docs(spark))).collect()
    }
    assert (1, 2) in pairs and (4, 5) in pairs
    assert (1, 6) not in pairs and (4, 6) not in pairs


def test_simhash_and_hamming(spark):
    fp = simhash(_docs(spark))
    vals = {r.doc_id: r.simhash for r in fp.collect()}
    assert vals[1] == vals[2]
    assert 0 <= vals[1] < (1 << 16)
    near = {
        (r.doc_a, r.doc_b): r.dist
        for r in hamming_neighbors(fp, max_dist=4).collect()
    }
    assert near[(1, 2)] == 0
    assert (1, 6) not in near


def test_jaccard_pairs(spark):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(_docs(spark), threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 6) not in pairs
