"""Bigram-LM perplexity operator vs an independent pure-Python oracle."""

import math

import pandas as pd
import pytest

from hayoo_spark.analysis import tokenize_py
from hayoo_spark.ops import lm


@pytest.fixture(scope="module")
def lm_docs(spark):
    rows = [
        (0, "the cat sat on the mat the cat sat"),
        (1, "the dog sat on the log"),
        (2, "completely novel wording here"),
        (3, "the the the the"),          # degenerate repetition
        (4, "xx"),                       # single token -> no bigrams
        (5, ""),                         # empty
        (6, None),                       # null text
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
            {"doc_id": "int64"}))


def _py_lm(texts):
    """Independent reference: counts + per-doc centibit sums."""
    uni, bi = {}, {}
    toks = {k: tokenize_py(t or "") for k, t in texts}
    for ts in toks.values():
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    V = len(uni)
    out = {}
    for k, ts in toks.items():
        s, n = 0, 0
        for a, b in zip(ts, ts[1:]):
            ratio = (uni.get(a, 0) + V) / (bi.get((a, b), 0) + 1)
            s += math.floor(100 * math.log2(ratio))
            n += 1
        out[k] = (n, s, (s / (100 * n)) if n else 0.0)
    return out


def test_perplexity_matches_python_oracle(spark, lm_docs):
    texts = [(r["doc_id"], r["text"]) for r in lm_docs.collect()]
    want = _py_lm(texts)
    got = {r["doc_id"]: (r["n_bigrams"], r["sum_centibits"],
                         r["bits_per_token"])
           for r in lm.lm_perplexity(lm_docs).collect()}
    assert set(got) == set(want)          # every doc appears, even empty
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == want[k][1], k
        assert got[k][2] == pytest.approx(want[k][2], abs=1e-12)


def test_repetitive_doc_scores_lower_entropy(spark, lm_docs):
    rows = {r["doc_id"]: r["bits_per_token"]
            for r in lm.lm_perplexity(lm_docs).collect()}
    # "the the the the" is maximally predictable under the self-trained
    # model; the novel-wording doc is the least predictable
    assert rows[3] < rows[0] < rows[2]
    assert rows[4] == 0.0 and rows[5] == 0.0 and rows[6] == 0.0


def test_pruned_vocab_matches_pruned_python_oracle(spark, lm_docs):
    model = lm.bigram_lm(lm_docs, vocab_top=2, bigram_top=3)
    assert model.unigrams.count() == 2
    assert model.bigrams.count() == 3
    # V is the UNPRUNED vocab size — pruning must not change smoothing
    full = lm.bigram_lm(lm_docs)
    assert model.vocab_size == full.vocab_size

    # independent pruned oracle: same (count desc, key asc) head rule,
    # pruned-away entries score as smoothed zeros
    texts = [(r["doc_id"], r["text"]) for r in lm_docs.collect()]
    uni, bi = {}, {}
    toks = {k: tokenize_py(t or "") for k, t in texts}
    for ts in toks.values():
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for p in zip(ts, ts[1:]):
            bi[p] = bi.get(p, 0) + 1
    V = len(uni)
    keep_u = dict(sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:2])
    keep_b = dict(sorted(bi.items(), key=lambda kv: (-kv[1], kv[0]))[:3])
    want = {}
    for k, ts in toks.items():
        s = 0
        for a, b in zip(ts, ts[1:]):
            ratio = (keep_u.get(a, 0) + V) / (keep_b.get((a, b), 0) + 1)
            s += math.floor(100 * math.log2(ratio))
        want[k] = s

    scored = lm.lm_perplexity(lm_docs, model=model, broadcast_lm=True)
    got = {r["doc_id"]: r["sum_centibits"] for r in scored.collect()}
    assert got == want


def test_score_unseen_docs_under_trained_model(spark, lm_docs):
    model = lm.bigram_lm(lm_docs)
    held = spark.createDataFrame(
        pd.DataFrame([(100, "entirely unseen words forever")],
                     columns=["doc_id", "text"]).astype({"doc_id": "int64"}))
    r = lm.lm_perplexity(held, model=model).collect()[0]
    # every bigram is OOV: ratio = (0+V)/(0+1) = V for each position
    V = model.vocab_size
    per = math.floor(100 * math.log2(V))
    assert r["n_bigrams"] == 3
    assert r["sum_centibits"] == 3 * per
