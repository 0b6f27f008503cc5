"""Offline FN-recovery lab: rank candidate linking levers BEFORE wiring
them into the pipeline (VERDICT r2 next-steps #1/#2 protocol: quantify
headroom per bucket, calibrate on val, hold out the gold corpora).

Works over the JSON dumps written by ``tools/error_analysis.py --dump``
(/tmp/dump_{val,ID-68,GSC+,GeneReviews}.json): for every FN it asks
"could scorer X have linked one of the gold mention surfaces to the
gold concept, and at what score margin?" — pure numpy, no Spark, so a
full sweep over thresholds runs in seconds.

Scorers:

* ``acro``  — unambiguous acronym table mined from surface initials
  (train.txt data, uppercase-mention gate).
* ``fuzzy`` — IDF-weighted bidirectional token alignment against every
  concept's surfaces (the trained-M4 feature space): token sim = exact
  /lemma/stem match=1, else char-ngram cosine; token weight = IDF over
  the 48.6k-surface corpus.  Reports gold-in-top1 and the score, so a
  threshold sweep shows the recoverable mass vs mislink mass.

Usage: python tools/model_lab.py /tmp/dump_val.json [--scorer fuzzy]
"""

from __future__ import annotations

import json
import math
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")

from phenobert_spark.functions.normalize import (  # noqa: E402
    lemma,
    process_str,
    simplify_tokens,
    stem,
)
from phenobert_spark.linking.models import HashedEncoder  # noqa: E402
from phenobert_spark.ontology import load_reference_ontology  # noqa: E402


class FuzzyIndex:
    """IDF-weighted fuzzy linker over all concept surfaces (numpy)."""

    def __init__(self, onto, dim: int = 512):
        self.onto = onto
        self.enc = HashedEncoder(dim)
        # simplified surface token bags per concept
        self.concepts: list[str] = []
        self.surf_tokens: list[list[str]] = []  # one entry per surface
        self.surf_concept: list[int] = []
        df: dict[str, int] = defaultdict(int)
        n_surf = 0
        for cid in sorted(onto.names):
            rows = []
            for s in onto.all_surfaces(cid):
                toks = simplify_tokens(process_str(s)) or process_str(s)
                if not toks:
                    continue
                rows.append([lemma(t) for t in toks])
            if not rows:
                continue
            ci = len(self.concepts)
            self.concepts.append(cid)
            for toks in rows:
                self.surf_tokens.append(toks)
                self.surf_concept.append(ci)
                n_surf += 1
                for t in set(toks):
                    df[t] += 1
        self.idf = {
            t: math.log((1 + n_surf) / (1 + c)) for t, c in df.items()
        }
        self.default_idf = math.log(1 + n_surf)
        # distinct surface-token vocabulary matrix for char-ngram sim
        self.vocab = sorted({t for toks in self.surf_tokens for t in toks})
        self.vpos = {t: i for i, t in enumerate(self.vocab)}
        self.vmat = np.vstack([self.enc._token_vec(t) for t in self.vocab])
        self.vstem = np.array([stem(t) for t in self.vocab], dtype=object)

    def score_all(self, phrase_tokens: list[str]) -> tuple[np.ndarray, list[str]]:
        """(n_concepts,) best-surface score per concept for the phrase."""
        ptoks = [lemma(t) for t in phrase_tokens]
        if not ptoks:
            return np.zeros(len(self.concepts)), self.concepts
        pmat = np.vstack([self.enc._token_vec(t) for t in ptoks])
        sims = self.vmat @ pmat.T  # (V, m)
        parr = np.array(ptoks, dtype=object)
        pstem = np.array([stem(t) for t in ptoks], dtype=object)
        varr = np.array(self.vocab, dtype=object)
        eq = (varr[:, None] == parr[None, :]) | (
            self.vstem[:, None] == pstem[None, :]
        )
        np.copyto(sims, 1.0, where=eq)
        np.clip(sims, 0.0, 1.0, out=sims)
        p_idf = np.array([self.idf.get(t, self.default_idf) for t in ptoks])
        best = np.zeros(len(self.concepts))
        for toks, ci in zip(self.surf_tokens, self.surf_concept):
            rows = [self.vpos[t] for t in toks]
            sub = sims[rows]  # (n_surf_tok, m)
            s_idf = np.array([self.idf.get(t, self.default_idf) for t in toks])
            cover_s = float((sub.max(axis=1) * s_idf).sum() / s_idf.sum())
            cover_p = float((sub.max(axis=0) * p_idf).sum() / p_idf.sum())
            sc = min(cover_s, cover_p)
            if sc > best[ci]:
                best[ci] = sc
        return best, self.concepts


def build_acro_table(onto) -> dict[str, str]:
    import re

    acro: dict[str, set[str]] = defaultdict(set)
    for cid in sorted(onto.names):
        for s in onto.all_surfaces(cid):
            words = re.findall(r"[A-Za-z]+", s)
            if len(words) >= 3:
                a = "".join(w[0] for w in words).lower()
                if 3 <= len(a) <= 6:
                    acro[a].add(cid)
    return {a: next(iter(cs)) for a, cs in acro.items() if len(cs) == 1}


def main():
    path = sys.argv[1]
    data = json.load(open(path))
    onto = load_reference_ontology()
    print(f"{data['dataset']}: FN={len(data['fns'])} FP={len(data['fps'])}")

    acro = build_acro_table(onto)
    import re

    n_acro = 0
    for fn in data["fns"]:
        gold = onto.canonical(fn["hpo_id"])
        for m in fn["mentions"]:
            if re.fullmatch(r"[A-Z][A-Z0-9-]{2,6}", m.strip()):
                hit = acro.get(re.sub(r"[^a-z0-9]", "", m.lower()))
                if hit and onto.canonical(hit) == gold:
                    n_acro += 1
                    print(f"  acro hit: {m!r} -> {gold}")
                    break
    print(f"acro-recoverable FNs: {n_acro}")

    if "--scorer" in sys.argv and "fuzzy" not in sys.argv:
        return
    idx = FuzzyIndex(onto)
    results = []  # (is_top1_gold, score, margin, mention, gold)
    for fn in data["fns"]:
        gold = onto.canonical(fn["hpo_id"])
        best = (False, 0.0, 0.0, "", gold)
        for m in fn["mentions"]:
            toks = simplify_tokens(process_str(m)) or process_str(m)
            if not toks or len(toks) > 12:
                continue
            scores, cids = idx.score_all(toks)
            order = np.argsort(-scores)
            top1 = onto.canonical(cids[order[0]])
            sc = float(scores[order[0]])
            margin = sc - float(scores[order[1]]) if len(order) > 1 else sc
            if top1 == gold and (not best[0] or sc > best[1]):
                best = (True, sc, margin, m, gold)
            elif not best[0] and sc > best[1]:
                best = (False, sc, margin, m, gold)
        results.append(best)
    hits = [r for r in results if r[0]]
    print(f"\nfuzzy top1==gold: {len(hits)}/{len(results)}")
    for th in (0.5, 0.6, 0.7, 0.8, 0.9):
        h = sum(1 for r in results if r[0] and r[1] >= th)
        miss = sum(1 for r in results if not r[0] and r[1] >= th)
        print(f"  θ={th}: recover {h}  (top1!=gold ≥θ: {miss})")
    print("\nsample recovered (θ≥0.7):")
    for ok, sc, mg, m, g in sorted(hits, key=lambda r: -r[1])[:25]:
        if sc >= 0.7:
            print(f"  {sc:.3f} {m!r} -> {g} [{idx.onto.names.get(g, '?')}]")


if __name__ == "__main__":
    main()
