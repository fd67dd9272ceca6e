"""BPE vocabulary training: incremental trainer vs brute-force
reference, Sennrich toy corpus, Spark pair-count / apply kernels."""

import pandas as pd
import pytest

from hayoo_spark.analysis import tokenize_py
from hayoo_spark.ops import bpe


def brute_train(hist, n_merges):
    """Independent reference: recompute all pair counts every merge."""
    words = {i: list(w) + [bpe.END] for i, (w, _) in enumerate(hist)}
    counts = {i: c for i, (_, c) in enumerate(hist)}
    merges = []
    for _ in range(n_merges):
        pn = {}
        for i, syms in words.items():
            for p in zip(syms, syms[1:]):
                pn[p] = pn.get(p, 0) + counts[i]
        if not pn:
            break
        top = max(pn.values())
        pair = min(p for p, n in pn.items() if n == top)
        merges.append(pair)
        joined = pair[0] + pair[1]
        for i, syms in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == pair:
                    out.append(joined)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
    return merges, words


SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_trainer_matches_brute_force_reference():
    merges = bpe.train_bpe(SENNRICH, 10)
    want, _ = brute_train(SENNRICH, 10)
    assert merges == want
    # the classic first merges: 'es' then 'est' dominate (newest+widest)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")


def test_trainer_exhausts_and_stops():
    merges = bpe.train_bpe([("ab", 1)], 100)
    want, _ = brute_train([("ab", 1)], 100)
    assert merges == want
    # ab + END: at most 2 merges before one symbol remains
    assert len(merges) == 2


def test_encode_word_reproduces_training_segmentation():
    merges = bpe.train_bpe(SENNRICH, 6)
    _, final_words = brute_train(SENNRICH, 6)
    rank = {p: i for i, p in enumerate(merges)}
    for i, (w, _) in enumerate(SENNRICH):
        assert bpe.encode_word(w, rank) == final_words[i]
    # unseen word: splits into learned pieces + leftovers, never crashes
    pieces = bpe.encode_word("lowest", rank)
    assert "".join(pieces) == "lowest" + bpe.END


@pytest.fixture(scope="module")
def bpe_docs(spark):
    rows = [(i, "low lower newest widest " * (i % 3 + 1))
            for i in range(12)]
    rows.append((12, ""))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
            {"doc_id": "int64"}))


def test_word_histogram_and_pair_counts(spark, bpe_docs):
    hist = bpe.word_histogram(bpe_docs)
    got = {r["word"]: r["wc"] for r in hist.collect()}
    want = {}
    for r in bpe_docs.collect():
        for w in tokenize_py(r["text"] or ""):
            want[w] = want.get(w, 0) + 1
    assert got == want

    pc = {(r["p1"], r["p2"]): r["cnt"]
          for r in bpe.bpe_pair_counts(hist).collect()}
    # brute pair counts over the histogram
    brute = {}
    for w, c in want.items():
        syms = list(w) + [bpe.END]
        for p in zip(syms, syms[1:]):
            brute[p] = brute.get(p, 0) + c
    assert pc == brute

    # max_words pruning is deterministic by (wc desc, word asc)
    top2 = {r["word"] for r in
            bpe.word_histogram(bpe_docs, max_words=2).collect()}
    order = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert top2 == {w for w, _ in order}


def test_apply_bpe_spark_kernel(spark, bpe_docs):
    hist = bpe.word_histogram(bpe_docs)
    merges = bpe.train_bpe(hist, 8)
    rank = {p: i for i, p in enumerate(merges)}
    out = {r["doc_id"]: r for r in
           bpe.apply_bpe(bpe_docs, merges).collect()}
    for r in bpe_docs.collect():
        ts = tokenize_py(r["text"] or "")
        n_pieces = sum(len(bpe.encode_word(w, rank)) for w in ts)
        row = out[r["doc_id"]]
        assert row["n_tokens"] == len(ts)
        assert row["n_pieces"] == n_pieces
        if ts:
            assert row["pieces_per_token"] == pytest.approx(
                n_pieces / len(ts))
        else:
            assert row["pieces_per_token"] == 0.0
