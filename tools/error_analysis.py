"""False-negative / false-positive analysis on the golden corpora.

Buckets every doc-level FN (gold (doc_id, hpo_id) missing from pred) by
failure mode so recall work can be targeted (VERDICT r1 next-steps #5):

  unknown_id   gold id absent from the rebuilt ontology -> alt-id gap
               (the real alt-id map lives in the missing hpo.json blob)
  dict_exact   the gold mention's strict key IS in the dictionary ->
               the pipeline lost it structurally (candidate gen window,
               containment suppression, span dedup)
  dict_lemma / dict_stem   recoverable by the existing fallback tiers
  oov          a mention token (and its lemma/stem) appears in no
               dictionary key -> semantic gap (needs the trained model)
  morph        every token known but no key matches -> morphology or
               word-order gap, lexically recoverable

Usage: python tools/error_analysis.py [ID-68|GSC+|val|GeneReviews] [--model]
"""

from __future__ import annotations

import sys
from collections import Counter, defaultdict

sys.path.insert(0, ".")

from phenobert_spark.config import PipelineConfig, get_spark  # noqa: E402
from phenobert_spark.corpus import (  # noqa: E402
    load_reference_corpus,
    load_reference_gold,
    with_doc_id,
)
from phenobert_spark.evaluate import evaluate_sets  # noqa: E402
from phenobert_spark.functions.normalize import (  # noqa: E402
    lemma,
    process_str,
    simplify_tokens,
    sorted_bag_key,
    stem,
    stem_key_of,
)
from phenobert_spark.ontology import load_reference_ontology  # noqa: E402
from phenobert_spark.pipeline import annotate  # noqa: E402


def classify_fn(mentions: list[str], hpo_id: str, onto) -> str:
    if onto.canonical(hpo_id) not in onto.names:
        return "unknown_id"
    vocab = onto.vocab()
    stem_vocab = {t for k in onto.stem2hpo for t in k.split()}
    best = "oov"
    rank = {"dict_exact": 0, "dict_lemma": 1, "dict_stem": 2, "morph": 3, "oov": 4}
    for m in mentions:
        toks = process_str(m)
        simple = simplify_tokens(toks)
        key = sorted_bag_key(toks)
        skey2 = sorted_bag_key(simple) if simple else None
        lkey = sorted_bag_key(sorted(lemma(t) for t in toks))
        slkey = (
            sorted_bag_key(sorted(lemma(t) for t in simple)) if simple else None
        )
        skey = stem_key_of(toks)
        if any(
            k in onto.phrase2hpo or k in onto.simple2hpo
            for k in (key, skey2)
            if k
        ):
            cls = "dict_exact"
        elif any(
            k in onto.phrase2hpo or k in onto.simple2hpo
            for k in (lkey, slkey)
            if k
        ):
            cls = "dict_lemma"
        elif skey in onto.stem2hpo:
            cls = "dict_stem"
        elif all(
            t in vocab or lemma(t) in vocab or stem(t) in stem_vocab for t in toks
        ):
            cls = "morph"
        else:
            cls = "oov"
        if rank[cls] < rank[best]:
            best = cls
    return best


def main():
    dataset = sys.argv[1] if len(sys.argv) > 1 else "ID-68"
    use_model = "--model" in sys.argv
    spark = get_spark(master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    onto = load_reference_ontology()
    cfg = PipelineConfig(use_model_stages=use_model)

    docs = load_reference_corpus(spark, dataset)
    docs_id = with_doc_id(docs)
    gold = (
        load_reference_gold(spark, dataset)
        .withColumnRenamed("doc_id", "path")
        .join(docs_id.select("path", "doc_id"), on="path")
        .drop("path")
    )
    triples = annotate(spark, docs, onto, cfg)
    m = evaluate_sets(
        spark, triples, gold, onto, doc_universe=docs_id.select("doc_id")
    )
    print({k: round(v, 4) if isinstance(v, float) else v for k, v in m.items()})

    from phenobert_spark.canonicalize import canonicalize_ids, filter_abnormal

    pred_sets = {
        (r.doc_id, r.hpo_id)
        for r in filter_abnormal(canonicalize_ids(triples, spark, onto), spark, onto)
        .select("doc_id", "hpo_id")
        .distinct()
        .collect()
    }
    gold_rows = gold.collect()
    gold_mentions: dict[tuple[str, str], list[str]] = defaultdict(list)
    for r in gold_rows:
        gold_mentions[(r.doc_id, onto.canonical(r.hpo_id))].append(r.mention)
    gold_sets = {
        (d, h)
        for r in filter_abnormal(canonicalize_ids(gold, spark, onto), spark, onto)
        .select("doc_id", "hpo_id")
        .distinct()
        .collect()
        for d, h in [(r.doc_id, r.hpo_id)]
    }

    fns = sorted(gold_sets - pred_sets)
    fps = sorted(pred_sets - gold_sets)
    print(f"\nFN={len(fns)} FP={len(fps)} TP={len(gold_sets & pred_sets)}")

    buckets: dict[str, list] = defaultdict(list)
    for doc_id, hpo_id in fns:
        mentions = gold_mentions.get((doc_id, hpo_id)) or gold_mentions.get(
            (doc_id, hpo_id), []
        )
        if not mentions:  # canonicalization moved the id
            for (d, h), ms in gold_mentions.items():
                if d == doc_id and onto.canonical(h) == hpo_id:
                    mentions = ms
                    break
        cls = classify_fn(mentions, hpo_id, onto)
        buckets[cls].append((hpo_id, mentions[:2]))
    print("\nFN buckets:", dict(Counter({k: len(v) for k, v in buckets.items()})))
    for cls, items in sorted(buckets.items()):
        print(f"\n== {cls} ({len(items)}) ==")
        for hpo_id, ms in items[:15]:
            name = onto.names.get(onto.canonical(hpo_id), "?")
            print(f"  {hpo_id} [{name}] <- {ms}")

    # FP sample: what are we predicting that gold lacks?
    print(f"\n== FP sample ({len(fps)}) ==")
    tr = triples.select("doc_id", "hpo_id", "mention").distinct().collect()
    fp_mentions = defaultdict(set)
    for r in tr:
        fp_mentions[(r.doc_id, onto.canonical(r.hpo_id))].add(r.mention)
    fp_count = Counter()
    for d, h in fps:
        for mtn in fp_mentions.get((d, h), {"?"}):
            fp_count[(h, mtn)] += 1
    for (h, mtn), n in fp_count.most_common(25):
        print(f"  {n:3d}x {h} [{onto.names.get(h, '?')}] <- {mtn!r}")

    if "--dump" in sys.argv:
        import json

        path = sys.argv[sys.argv.index("--dump") + 1]
        with open(path, "w") as f:
            json.dump(
                {
                    "dataset": dataset,
                    "metrics": {k: v for k, v in m.items()},
                    "fns": [
                        {
                            "doc_id": d,
                            "hpo_id": h,
                            "mentions": gold_mentions.get((d, h))
                            or next(
                                (
                                    ms
                                    for (dd, hh), ms in gold_mentions.items()
                                    if dd == d and onto.canonical(hh) == h
                                ),
                                [],
                            ),
                        }
                        for d, h in fns
                    ],
                    "fps": [
                        {
                            "doc_id": d,
                            "hpo_id": h,
                            "mentions": sorted(fp_mentions.get((d, h), [])),
                        }
                        for d, h in fps
                    ],
                    "preds": sorted(map(list, pred_sets)),
                    "pred_mentions": [
                        [d, h, sorted(ms)] for (d, h), ms in fp_mentions.items()
                    ],
                },
                f,
            )
        print(f"dumped -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
