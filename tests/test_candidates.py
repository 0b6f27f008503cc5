"""Candidate generation semantics (reference util.py:875-1018)."""

from phenobert_spark.corpus import split_sentence_safe
from phenobert_spark.operators.candidates import candidates_of_text


def keys(text):
    return {c[3] for c in candidates_of_text(text)}


def test_kmer_enumeration_and_singleton_filter():
    ks = keys("severe seizure disorder.")
    assert "seizure" in ks
    assert "seizure severe" in ks  # sorted-bag of "severe seizure"
    assert "disorder seizure severe" in ks
    # stopword singleton never emitted
    assert "the" not in keys("the seizure.")


def test_clause_split_blocks_kmers():
    ks = keys("seizure, ataxia.")
    assert "seizure" in ks and "ataxia" in ks
    assert "ataxia seizure" not in ks  # comma is a clause boundary


def test_conjunction_split_and_recovery():
    cands = candidates_of_text("hands and feet anomalies.")
    ks = {c[3] for c in cands}
    assert "hands" in ks
    assert "anomalies feet" in ks
    # A+B elision recovery: A=[hands], B=[feet, anomalies] -> hands + anomalies
    assert "anomalies hands" in ks


def test_negation_flag():
    cands = candidates_of_text("no seizures were observed.")
    by_key = {c[3]: c for c in cands}
    assert by_key["seizures"][7] is True or by_key["seizures"][7] == True
    cands2 = candidates_of_text("frequent seizures observed.")
    by_key2 = {c[3]: c for c in cands2}
    assert not by_key2["seizures"][7]


def test_offsets_index_raw_text():
    text = "Patient has Short stature."
    for start, end, mention, *_ in candidates_of_text(text):
        assert text[start:end] == mention


def test_chunk_offsets_shift():
    text = "alpha beta. gamma delta."
    whole = {(c[0], c[1], c[3]) for c in candidates_of_text(text)}
    chunked = set()
    for cstart, ctext in split_sentence_safe(text, 12):
        for c in candidates_of_text(ctext, cstart):
            chunked.add((c[0], c[1], c[3]))
    assert whole == chunked


def test_chunker_covers_text_exactly():
    text = ("word " * 50 + ". ") * 20
    chunks = split_sentence_safe(text, 64)
    rebuilt = "".join(t for _, t in chunks)
    assert rebuilt == text
    pos = 0
    for cstart, ctext in chunks:
        assert cstart == pos
        pos += len(ctext)


def test_pure_number_phrases_dropped():
    assert "12" not in keys("value 12.")
    assert all("3 5" not in k for k in keys("3 5."))


def test_abbreviation_dot_does_not_split_clause():
    """A '.' after a known abbreviation (Punkt-style) keeps the clause
    alive: negation scope carries across 'et al.' but a real sentence
    end still resets it."""
    from phenobert_spark.operators.candidates import candidates_of_text

    # abbreviation dot: negation carries over to 'seizures'
    cands = candidates_of_text("no data from Smith et al. seizures occurred")
    seiz = [c for c in cands if c[2] == "seizures"]
    assert seiz and seiz[0][-2] is True
    # the swallowed abbreviation dot never appears inside a k-mer key
    assert not any("." in c[3] for c in cands)
    # real sentence end: negation scope resets
    cands2 = candidates_of_text("no data were found. seizures occurred")
    seiz2 = [c for c in cands2 if c[2] == "seizures"]
    assert seiz2 and seiz2[0][-2] is False


def test_clause_split_parity_id68():
    """T5 parity (tools/punkt_parity.py): no gold ID-68 mention may be
    split by a WORD clause-breaker — 'both'/'that'/'to' are NER-kept in
    the reference and exempted here. The only tolerated breakers are
    commas: a comma INSIDE a gold mention (4 cases, all comma-list
    annotations like 'areas ..., in the periventricular region') splits
    under the reference's own spliter set too (util.py:763)."""
    import os

    import pytest

    if not os.path.isdir("/root/reference/phenobert/data/ID-68"):
        pytest.skip("reference checkout not present")
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.punkt_parity import audit

    div = audit("ID-68")
    assert len(div) <= 4, div
    assert all(b == "," for *_, b in div), div
