"""End-to-end annotation pipeline: documents -> (doc_id, has_phenotype,
HPO:ID) triples (SURVEY.md §3 E1 lifecycle, Spark-first).

Physical plan (two shuffles total on the hot path, SURVEY.md §4):

    iceberg/parquet scan (content + keys only — column pruning)
      -> doc_id = sha2(content)                       [narrow]
      -> skew chunker                                 [narrow]
      -> repartition(doc_id, chunk_id)                [shuffle 1: salt]
      -> candidate mapInPandas (Arrow)                [narrow]
      -> broadcast dict joins (J1)                    [no shuffle]
      -> (optional model stages, pandas UDFs)         [narrow]
      -> window dedup + maximal spans (J4)            [shuffle 2: doc_id]
      -> triples
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .canonicalize import canonicalize_ids
from .config import PipelineConfig
from .corpus import chunked, with_doc_id
from .ontology import Ontology
from .operators.candidates import generate_candidates
from .operators.dict_link import dictionary_link
from .operators.spans import (
    keep_maximal_spans,
    suppress_contained_in,
    suppress_containing,
)

TRIPLES_COLS = [
    "doc_id", "pred", "hpo_id", "start", "end", "mention", "score", "negated",
]

# Closed class of degree/laterality/temporal modifiers a mention may
# carry WITHOUT changing which concept it denotes ("severe X" -> X).
# Linguistic public knowledge, pinned; used only by the default-off
# query-side drop-one tier. Concept-frequency cannot stand in for this:
# "severe" names 52 concepts while anatomical "proximal" names 415.
DROPPABLE_MODIFIERS = frozenset(
    {
        "severe", "mild", "moderate", "profound", "marked", "slight",
        "onset", "postnatal", "prenatal", "congenital", "bilateral",
        "unilateral", "generalized", "localized", "chronic", "acute",
        "recurrent", "episodic", "progressive", "intermittent",
        "occasional", "frequent", "persistent", "constant", "diffuse",
        "focal", "partial", "complete", "isolated", "multiple",
        "early", "late", "significant", "apparent", "typical",
    }
)


def annotate(
    spark: SparkSession,
    docs: DataFrame,
    onto: Ontology,
    cfg: PipelineConfig = PipelineConfig(),
    dict_df: DataFrame | None = None,
    vocab_bc=None,
) -> DataFrame:
    """documents(repo, path, commit, lang, content) -> triples DF.

    ``content`` is read once and dropped right after candidate
    generation; nothing downstream carries document bodies (critical for
    the 100 TB scan — SURVEY.md §4 'never carry content past candidate
    generation').
    """
    docs = with_doc_id(docs)
    chunks = chunked(docs.select("doc_id", "content"), cfg.chunk_target_bytes)
    nparts = cfg.candidate_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    chunks = chunks.repartition(nparts, "doc_id", "chunk_id")

    # Exact candidate pruning: k-mers with out-of-vocabulary tokens are
    # provable dictionary misses (~20-50x fewer candidate rows). The
    # model stages want the over-generated set, so pruning is off there.
    if vocab_bc is None and cfg.vocab_prune:
        # broadcast cache: the vocab object itself is already cached on
        # the ontology, but sc.broadcast() re-serializes and re-ships it
        # on every annotate() call — repeated invocations (bench loops,
        # notebook sessions) reuse the broadcast as long as the same
        # SparkContext is alive (keyed by applicationId)
        bc_cache = onto.__dict__.setdefault("_vocab_bc_cache", {})
        bk = (
            spark.sparkContext.applicationId,
            cfg.use_model_stages,
            cfg.syn_tier_min_count,
            cfg.syn_phrase_min_count,
        )
        vocab_bc = bc_cache.get(bk)
        if vocab_bc is None:
            if cfg.use_model_stages:
                # relaxed predicate: keep morphological variants for the
                # fuzzy model stage (prefix-5 / lemma adjacency)
                from .linking.models import RelaxedVocab

                vocab_bc = spark.sparkContext.broadcast(
                    RelaxedVocab(onto.vocab())
                )
            else:
                vocab_bc = spark.sparkContext.broadcast(
                    onto.prune_vocab(
                        syn_min_count=cfg.syn_tier_min_count,
                        syn_phrase_min_count=cfg.syn_phrase_min_count,
                    )
                )
            bc_cache[bk] = vocab_bc
    gate_bc = None
    if cfg.gate_max_df is not None:
        bc_cache = onto.__dict__.setdefault("_vocab_bc_cache", {})
        gk = (spark.sparkContext.applicationId, "gate", cfg.gate_max_df)
        gate_bc = bc_cache.get(gk)
        if gate_bc is None:
            gate_bc = spark.sparkContext.broadcast(
                onto.head_vocab(cfg.gate_max_df)
            )
            bc_cache[gk] = gate_bc
    cands = generate_candidates(
        chunks, cfg.max_kmer_len, vocab_bc=vocab_bc, gate_bc=gate_bc
    )
    dict_df = (
        dict_df
        if dict_df is not None
        else onto.dict_df(
            spark,
            syn_min_count=cfg.syn_tier_min_count,
            syn_phrase_min_count=cfg.syn_phrase_min_count,
            drop_one=cfg.drop_one_dict,
        )
    )
    linked = dictionary_link(
        cands,
        dict_df,
        has_syn_tier=cfg.syn_tier_min_count is not None,
        has_drop_one=cfg.drop_one_dict,
    )

    matched = linked.filter(F.col("hpo_id").isNotNull())

    if cfg.drop_one_query:
        from .operators.dict_link import drop_one_link

        fuzzy_misses = linked.filter(
            F.col("hpo_id").isNull() & F.col("n_tokens").between(3, 7)
        ).drop("hpo_id", "score")
        droppable_df = spark.createDataFrame(
            [(t,) for t in sorted(DROPPABLE_MODIFIERS)], "token string"
        )
        fuzzy = drop_one_link(fuzzy_misses, dict_df, droppable_df)
        matched = matched.unionByName(fuzzy.select(*matched.columns))

    if cfg.use_model_stages:
        from .linking.infer import model_link

        unmatched = (
            linked.filter(F.col("hpo_id").isNull())
            .filter(F.col("n_tokens") <= cfg.model_max_tokens)
            # fuzzy acceptance of a NEGATED candidate is pure FP risk:
            # the dictionary path keeps negated matches only because
            # the reference emits them flagged (util.py:1171-1209); a
            # model-stage guess on top of a negation cue has no parity
            # precedent and measured -0.4 val precision.
            .filter(~F.col("negated"))
            .drop("hpo_id", "score")
        )
        # J3: skip candidates nested inside an already-matched span
        # (gappy recovered spans don't contain what they don't cover).
        anchors = matched.filter(~F.col("gappy"))
        survivors = suppress_contained_in(unmatched, anchors)
        # ... and candidates CONTAINING an exact match are equally
        # barred: a longer fuzzy span must not displace the exact
        # dictionary match inside it under use_longest resolution.
        survivors = suppress_containing(survivors, anchors)
        model_matched = model_link(spark, survivors, onto, cfg)
        if model_matched is not None:
            matched = matched.unionByName(model_matched.select(*matched.columns))

    # Deduplicate identical char spans (full phrase vs A+B recovery over
    # the same extent): reference keeps the variant with more tokens
    # (use_longest measures word count, util.py:1180-1185).
    # Partition by doc_id only — the same partitioning the maximal-span
    # window needs — so the two windows share ONE exchange (the
    # (doc,start,end) grouping is resolved by sort order + lag instead
    # of a second shuffle).
    w = Window.partitionBy("doc_id").orderBy(
        F.col("start").asc(),
        F.col("end").asc(),
        F.col("score").desc(),
        F.col("n_tokens").desc(),
        F.col("hpo_id").asc(),
    )
    matched = (
        matched.withColumn("_ps", F.lag("start").over(w))
        .withColumn("_pe", F.lag("end").over(w))
        .filter(
            F.col("_ps").isNull()
            | (F.col("_ps") != F.col("start"))
            | (F.col("_pe") != F.col("end"))
        )
        .drop("_ps", "_pe")
    )

    final = (
        keep_maximal_spans(matched, gappy_col="gappy")
        if cfg.use_longest
        else matched
    )
    triples = final.select(
        "doc_id",
        F.lit("has_phenotype").alias("pred"),
        "hpo_id",
        "start",
        "end",
        "mention",
        "score",
        "negated",
    )
    return canonicalize_ids(triples, spark, onto)
