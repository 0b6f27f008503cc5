"""T5 parity audit: which GOLD mentions straddle one of our clause
boundaries? A mention split across clauses can never be generated as a
candidate, so every split-divergent gold mention is a structural FN
attributable to the clause splitter (the reference uses NLTK Punkt,
util.py:578-595; the rebuild ships a deterministic abbreviation-aware
splitter in operators/candidates.py).

Usage: python tools/punkt_parity.py [ID-68 GSC+ ...]
"""

from __future__ import annotations

import sys
from collections import Counter

sys.path.insert(0, ".")

from phenobert_spark.corpus import parse_gold_rows  # noqa: E402
from phenobert_spark.functions.normalize import (  # noqa: E402
    normalize_text_keep_len,
    tokenize_with_offsets,
)
from phenobert_spark.operators.candidates import _clauses  # noqa: E402


def clause_spans(text: str) -> list[tuple[int, int]]:
    toks = tokenize_with_offsets(normalize_text_keep_len(text))
    return [
        (cl[0][1], cl[-1][2]) for cl in _clauses(toks) if cl
    ]


def audit(dataset: str, root: str = "/root/reference") -> list[tuple]:
    import os

    corpus_dir = os.path.join(root, "phenobert", "data", dataset, "corpus")
    texts = {}
    for fn in os.listdir(corpus_dir):
        with open(os.path.join(corpus_dir, fn), encoding="utf-8", errors="replace") as f:
            texts[fn] = f.read()
    divergent = []
    for row in parse_gold_rows(dataset, root):
        doc, start, end, mention, hpo = row
        text = texts.get(doc)
        if text is None:
            continue
        spans = clause_spans(text)
        inside = [sp for sp in spans if sp[0] < end and start < sp[1]]
        if len(inside) > 1:
            # the mention's tokens live in more than one clause
            breaker = text[inside[0][1] : inside[1][0]].strip()
            divergent.append((doc, mention, hpo, breaker))
    return divergent


def main():
    datasets = sys.argv[1:] or ["ID-68", "GSC+", "GeneReviews", "val"]
    for ds in datasets:
        div = audit(ds)
        breakers = Counter(b for *_, b in div)
        print(f"{ds}: {len(div)} split-divergent gold mentions; "
              f"breakers: {dict(breakers.most_common(10))}")
        for doc, m, hpo, b in div[:15]:
            print(f"   {hpo} {m!r} (break: {b!r})")


if __name__ == "__main__":
    main()
