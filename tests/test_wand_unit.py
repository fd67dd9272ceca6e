"""Unit tests for the segment evaluator: block-max pruned == exhaustive
(the WAND ≡ un-pruned invariant, SURVEY.md §5.3), no Spark needed."""

import numpy as np
import pandas as pd

from hayoo_spark.index import codec
from hayoo_spark.query import plan as P
from hayoo_spark.query.wand import SegmentData, SegmentEvaluator


def make_segment(seed=7, n_docs=5000, terms=("alpha", "beta", "gamma", "delta")):
    rng = np.random.RandomState(seed)
    dls = rng.randint(20, 400, size=n_docs)
    docs_pdf = pd.DataFrame({
        "doc_id": np.arange(n_docs),
        "url": [f"u/{i:06d}" for i in range(n_docs)],
        "lang": rng.choice(["en", "de"], size=n_docs),
        "warc_ts": pd.to_datetime("2024-01-01"),
        "dl": dls,
    })
    avgdl = float(dls.mean())
    rows = []
    for ti, t in enumerate(terms):
        df = int(n_docs * (0.5 ** (ti + 1)))
        ids = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        tfs = rng.randint(1, 12, size=df).astype(np.int64)
        # split into 2 salted sub-lists for one term to exercise the merge
        n_salts = 2 if ti == 0 else 1
        for s in range(n_salts):
            m = ids % n_salts == s
            sids, stfs = ids[m], tfs[m]
            ids_vb = codec.varbyte_encode(codec.delta_encode(sids.astype(np.uint64)))
            tfs_vb = codec.varbyte_encode(stfs.astype(np.uint64))
            pos_vb = codec.encode_positions(
                [np.arange(tf, dtype=np.uint64) * 3 for tf in stfs])
            blast, bub = codec.block_maxes(sids, stfs, dls[sids], avgdl, 64)
            rows.append({
                "segment": 0, "term": t, "salt": s, "df": len(sids),
                "cf": int(stfs.sum()), "ids_vb": ids_vb, "tfs_vb": tfs_vb,
                "pos_vb": pos_vb, "block_last": blast.tolist(),
                "block_ub": bub.tolist(), "max_ub": float(bub.max()),
            })
    post_pdf = pd.DataFrame(rows)
    idf = {t: 1.5 - 0.3 * i for i, t in enumerate(terms)}
    sd = SegmentData(post_pdf, docs_pdf)
    return SegmentEvaluator(sd, idf, avgdl), terms


def _topm_exhaustive(ev, node, m):
    ids, sc = ev.evaluate(node)
    order = np.lexsort((ev.seg.urls[ids], -sc))[:m]
    return ids[order], sc[order]


def test_pruned_or_equals_exhaustive():
    ev, terms = make_segment()
    for m in (1, 10, 100, 10_000):
        leaves = [(t, 1.0) for t in terms]
        pi, ps = ev.top_m_pruned("or", leaves, m)
        ei, es = _topm_exhaustive(ev, P.Or(tuple(P.Term(t) for t in terms)), m)
        assert np.array_equal(pi, ei), f"m={m}"
        assert np.allclose(ps, es)


def test_pruned_and_equals_exhaustive():
    ev, terms = make_segment()
    node = P.And(tuple(P.Term(t) for t in terms[:2]))
    pi, ps = ev.top_m_pruned("and", [(t, 1.0) for t in terms[:2]], 50)
    ei, es = _topm_exhaustive(ev, node, 50)
    assert np.array_equal(pi, ei)
    assert np.allclose(ps, es)


def test_pruned_with_boosts():
    ev, terms = make_segment()
    leaves = [(terms[0], 2.0), (terms[1], 0.5)]
    node = P.Or((P.Term(terms[0], boost=2.0), P.Term(terms[1], boost=0.5)))
    pi, ps = ev.top_m_pruned("or", leaves, 25)
    ei, es = _topm_exhaustive(ev, node, 25)
    assert np.array_equal(pi, ei)
    assert np.allclose(ps, es)


def test_salted_merge_matches_single_list():
    """Term 'alpha' is stored as 2 salted sub-lists; decoded postings must
    be one sorted list with rebuilt block metadata."""
    ev, terms = make_segment()
    ids, tfs, blast, bub = ev.seg.postings("text", "alpha")
    assert np.all(np.diff(ids) > 0)
    assert np.all(np.diff(blast) > 0)
    bs = codec.BLOCK_SIZE  # merged lists are re-blocked at the default size
    assert len(bub) == (len(ids) + bs - 1) // bs
    norms = codec.tf_norm(tfs, ev.seg.dls["text"][ids], ev.avgdl["text"])
    for b in range(len(bub)):
        s, e = b * bs, min((b + 1) * bs, len(ids))
        assert np.isclose(bub[b], norms[s:e].max())
