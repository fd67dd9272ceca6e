"""Round-trip tests for the posting-list codec (pure numpy, no Spark)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hayoo_spark.index import codec


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(xs):
    arr = np.array(xs, dtype=np.uint64)
    assert np.array_equal(codec.varbyte_decode(codec.varbyte_encode(arr)), arr)


def test_varbyte_boundaries():
    arr = np.array([0, 127, 128, 16383, 16384, 2**21 - 1, 2**21, 2**63 - 1, 2**64 - 1],
                   dtype=np.uint64)
    assert np.array_equal(codec.varbyte_decode(codec.varbyte_encode(arr)), arr)


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=300, unique=True))
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(ids):
    ids = np.array(sorted(ids), dtype=np.uint64)
    tfs = (ids % 17 + 1).astype(np.uint64)
    ids_vb, tfs_vb = codec.encode_postings(ids, tfs)
    dec_ids, dec_tfs = codec.decode_postings(ids_vb, tfs_vb)
    assert np.array_equal(dec_ids, ids)
    assert np.array_equal(dec_tfs, tfs)


def test_positions_roundtrip():
    poss = [np.array([0, 5, 9]), np.array([2]), np.array([1, 3])]
    tfs = np.array([3, 1, 2])
    buf = codec.encode_positions(poss)
    out = codec.decode_positions(buf, tfs)
    for a, b in zip(poss, out):
        assert np.array_equal(np.asarray(a, dtype=np.uint64), b)


def test_block_maxes():
    n = 300
    ids = np.arange(n, dtype=np.uint64) * 3
    tfs = np.ones(n, dtype=np.uint64)
    tfs[130] = 50  # spike in block 1
    dls = np.full(n, 100.0)
    last, ub = codec.block_maxes(ids, tfs, dls, avgdl=100.0, block_size=128)
    assert len(last) == 3
    assert last[0] == ids[127] and last[-1] == ids[-1]
    assert ub[1] > ub[0]
    norms = codec.tf_norm(tfs, dls, 100.0)
    assert np.isclose(ub[1], norms[128:256].max())


def test_compression_is_compact():
    # dense doc ids -> deltas of 1 -> 1 byte each
    ids = np.arange(10_000, dtype=np.uint64)
    tfs = np.ones(10_000, dtype=np.uint64)
    ids_vb, tfs_vb = codec.encode_postings(ids, tfs)
    assert len(ids_vb) == 10_000
    assert len(tfs_vb) == 10_000
