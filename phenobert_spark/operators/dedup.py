"""Deduplication operators for training-data pipelines (task brief:
first-class components alongside the KG operators).

All are pure DataFrame compositions (JVM-side, whole-stage codegen —
no UDFs), portable hashing via md5 so every operator has an exact
DuckDB oracle (plans/contract_queries q12/q16/q17/q18 call these
functions and the driver value-checks them):

* ``exact_dedup``        — content-hash groupBy, keep one survivor.
* ``minhash_signatures`` — k seeded MinHashes over w-token shingles.
* ``lsh_candidate_pairs``— banding + bucket self-join (the scale path:
  only same-band pairs materialize, never the full cross-join).
* ``simhash``            — n-bit majority-vote fingerprint.
* ``jaccard_pairs``      — token-set Jaccard above a threshold.

Scale notes: signatures/fingerprints are one narrow pass per document.
The LSH join shuffles on the band hash — at 10^12 docs the band key
spreads uniformly (md5), and near-dup clusters bound bucket sizes;
pathological buckets are handled by AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _shingles(text_col, w: int = 3):
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    n = F.greatest(F.size(toks) - (w - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(toks, i, w), " "),
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the smallest id per identical content hash."""
    w = Window.partitionBy("_h").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_h", F.md5(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_h", "_rn")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 4,
    shingle_w: int = 3,
) -> DataFrame:
    """(id, mh1..mhN): per-document MinHash signature. Seeded md5 is the
    hash family — deterministic, portable, no UDF."""
    sh = _shingles(F.col(text_col), shingle_w)
    names = [f"mh{i+1}" for i in range(n_hashes)]
    seeds = [f"s{i+1}" for i in range(n_hashes)]
    # ONE traversal of the shingle array computing every seeded min via a
    # struct accumulator: separate array_min(transform(...)) expressions
    # would each re-tokenize and re-shingle the text (the lambdas block
    # common-subexpression elimination).
    init = F.struct(*[F.lit("~").alias(n) for n in names])  # '~' > any hex

    def step(acc, s):
        return F.struct(
            *[
                F.least(acc[n], F.md5(F.concat(F.lit(seed), s))).alias(n)
                for n, seed in zip(names, seeds)
            ]
        )

    agg = F.aggregate(sh, init, step)
    return df.select(
        F.col(id_col).alias("doc_id"), *[agg[n].alias(n) for n in names]
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: list[list[str]] | None = None
) -> DataFrame:
    """Band the signature columns and self-join on band hash ->
    (doc_a < doc_b) near-duplicate candidate pairs."""
    sig_cols = [c for c in signatures.columns if c.startswith("mh")]
    if bands is None:
        half = max(len(sig_cols) // 2, 1)
        bands = [sig_cols[:half], sig_cols[half:] or sig_cols[:half]]
    sig = signatures.localCheckpoint(eager=False)  # don't re-derive per branch
    banded = None
    for cols in bands:
        b = sig.select("doc_id", F.md5(F.concat(*cols)).alias("band"))
        banded = b if banded is None else banded.unionByName(b)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 16,
) -> DataFrame:
    """(id, simhash BIGINT): per-bit majority vote over token md5 hex
    digits, expressed with aggregate() — zero explode.

    n_bits caps at 63 (BIGINT). 16 bits saturates quickly on short
    same-vocabulary documents (birthday collisions by ~500 docs) — use
    32-63 in production; 16 is the oracle-checked contract default."""
    hs = F.transform(F.split(F.lower(F.trim(text_col)), r"\s+"), F.md5)
    out = df.select(F.col(id_col).alias("doc_id"), hs.alias("_hs"))
    high = F.array([F.lit(c) for c in "89abcdef"])

    def bit(p: int):
        vote = F.aggregate(
            "_hs",
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.array_contains(high, F.substring(h, p, 1)), 1).otherwise(-1),
        )
        return F.when(vote > 0, F.lit(1 << (p - 1))).otherwise(F.lit(0))

    total = None
    for p in range(1, n_bits + 1):
        total = bit(p) if total is None else total + bit(p)
    return out.select("doc_id", total.cast("bigint").alias("simhash"))


def hamming_neighbors(fingerprints: DataFrame, max_dist: int = 2) -> DataFrame:
    """SimHash pairs within a Hamming radius (bit_count of XOR)."""
    a = fingerprints.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa")
    )
    b = fingerprints.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb")
    )
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("dist", F.bit_count(F.expr("sa ^ sb")))
        .filter(F.col("dist") <= max_dist)
        .select("doc_a", "doc_b", "dist")
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.2,
) -> DataFrame:
    toks = F.array_distinct(F.split(F.lower(F.trim(text_col)), r"\s+"))
    t = df.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    a = t.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    b = t.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb")).cast("double")
    union = F.size("ta") + F.size("tb") - F.size(F.array_intersect("ta", "tb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )
