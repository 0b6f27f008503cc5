"""Hyperplane-LSH serving evidence: measured pair recall vs the
brute-force cosine ground truth (the q38/q32 pairing, quantified).

q38 proves the LSH path's surviving pairs are exactly-verified
cosines; what it cannot show alone is how many TRUE near-dup pairs
the banding missed. The docstring contract says < 1e-9 at the
defaults — this measures it, and the cheaper configurations a user
might be tempted into:

    python tools/lsh_recall.py [sf_dir] [threshold]

Prints one JSON line: {"n_true_pairs": ..., "recall": {"planes=64,
bits=4": r, ...}}. tests/test_similarity.py pins the default-config
floor from the sf0.01 curve.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def measured_recall(
    spark,
    emb,
    threshold: float,
    configs: list[tuple[int, int]],
) -> dict:
    import numpy as np

    from phenobert_spark.operators.similarity import cosine_neardup_lsh

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    iu = np.triu_indices(len(ids), k=1)
    mask = sims[iu] >= threshold
    gt = {
        (int(min(a, b)), int(max(a, b)))
        for a, b in zip(ids[iu[0][mask]], ids[iu[1][mask]])
    }
    out = {"n_true_pairs": len(gt), "recall": {}}
    for n_planes, band_bits in configs:
        got = {
            (int(r.id_a), int(r.id_b))
            for r in cosine_neardup_lsh(
                spark,
                emb,
                threshold=threshold,
                n_planes=n_planes,
                band_bits=band_bits,
            ).collect()
        }
        r = 1.0 if not gt else len(got & gt) / len(gt)
        out["recall"][f"planes={n_planes},bits={band_bits}"] = round(r, 4)
    return out


def with_near_dups(spark, emb):
    """The raw synthetic embeddings are near-orthogonal (max pairwise
    cosine ~0.51 at sf0.01), so a >=0.9 ground truth is empty there;
    recall must be measured on a corpus that HAS near-duplicates.
    Deterministically append one noisy replica per vector (seeded
    noise, scale swept 0.05-0.42 by index) so the true-pair cosines
    spread across ~0.90-0.999 — the regime the dedup threshold
    targets."""
    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    ids = [int(r.vec_id) for r in rows]
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    rng = np.random.RandomState(0xD0B)
    out_rows = []
    for i, (vid, v) in enumerate(zip(ids, mat)):
        out_rows.append((vid, [float(x) for x in v]))
        scale = 0.05 + 0.37 * ((i % 10) / 10.0)
        noise = rng.standard_normal(len(v)) * scale * np.linalg.norm(v) / (
            len(v) ** 0.5
        )
        out_rows.append((vid + 1_000_000, [float(x) for x in v + noise]))
    return spark.createDataFrame(
        out_rows, "vec_id long, embedding array<double>"
    )


def main() -> None:
    from phenobert_spark.config import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    emb = with_near_dups(
        spark, spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    )
    out = measured_recall(
        spark,
        emb,
        threshold,
        configs=[(64, 4), (32, 4), (64, 8), (16, 4), (64, 16)],
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
