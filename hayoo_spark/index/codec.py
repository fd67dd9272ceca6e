"""Posting-list physical format: delta + varbyte compression, block-max.

The custom physics the north rule requires (no Spark built-in):
sorted doc-id lists stored as delta-encoded variable-byte arrays with
per-block (B=128) max-score-upper-bound metadata for block-max WAND.
Reference analogue: Hunt's in-memory posting lists behind the context
index (not vendored in /root/reference; semantics per SURVEY.md §2.3 A4).

All encode/decode paths are vectorized numpy — these run inside Arrow
grouped-map UDFs on the executors, so per-row Python would be the
bottleneck at scale.

Varbyte layout: little-endian 7-bit groups, continuation bit 0x80 set on
every byte except the last byte of each value (classic VByte).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
K1 = 1.2
B = 0.75


def varbyte_encode_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Vectorized VByte encode of a uint64 array, returning the buffer
    AND per-value byte lengths — callers slicing independently-decodable
    spans (e.g. one span per document) out of a single vectorized encode
    need the value->byte offsets."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    # bytes needed per value: 1 + floor(bits/7) for bits > 7
    nbytes = np.ones(v.size, dtype=np.int64)
    for k in range(1, 10):
        nbytes += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    maxlen = int(nbytes.max())
    for i in range(maxlen):
        mask = nbytes > i
        byte = (v[mask] >> np.uint64(7 * i)).astype(np.uint64) & np.uint64(0x7F)
        cont = np.where(nbytes[mask] - 1 > i, 0x80, 0).astype(np.uint8)
        out[starts[mask] + i] = byte.astype(np.uint8) | cont
    return out.tobytes(), nbytes


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized VByte encode of a uint64 array."""
    return varbyte_encode_lengths(values)[0]


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Vectorized VByte decode -> uint64 array."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.zeros(0, dtype=np.uint64)
    # fast path: position streams are within-doc gaps, almost always
    # < 128 — a buffer with no continuation bytes decodes as itself
    # (one compare+reduce pass instead of the grouped-decode passes;
    # measured ~10x on the 3M cold-phrase tail)
    if not (raw & 0x80).any():
        return raw.astype(np.uint64)
    is_last = (raw & 0x80) == 0
    ends = np.flatnonzero(is_last)                   # index of last byte per value
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    out = np.zeros(ends.size, dtype=np.uint64)
    maxlen = int(lengths.max())
    payload = (raw & 0x7F).astype(np.uint64)
    for i in range(maxlen):
        mask = lengths > i
        out[mask] |= payload[starts[mask] + i] << np.uint64(7 * i)
    return out


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    a = np.asarray(sorted_ids, dtype=np.uint64)
    if a.size == 0:
        return a
    return np.concatenate(([a[0]], np.diff(a)))


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    d = np.asarray(deltas, dtype=np.uint64)
    return np.cumsum(d, dtype=np.uint64)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(doc_ids sorted asc, tfs aligned) -> (ids_vb, tfs_vb)."""
    order = np.argsort(doc_ids, kind="stable")
    ids = np.asarray(doc_ids, dtype=np.uint64)[order]
    tfs_o = np.asarray(tfs, dtype=np.uint64)[order]
    return varbyte_encode(delta_encode(ids)), varbyte_encode(tfs_o)


def decode_postings(ids_vb: bytes, tfs_vb: bytes) -> tuple[np.ndarray, np.ndarray]:
    return delta_decode(varbyte_decode(ids_vb)), varbyte_decode(tfs_vb)


def encode_positions(positions_per_doc: list[np.ndarray]) -> bytes:
    """Concatenated per-doc delta-encoded position lists (tf gives the
    split points at decode time)."""
    if not positions_per_doc:
        return b""
    parts = [delta_encode(np.asarray(p, dtype=np.uint64)) for p in positions_per_doc]
    return varbyte_encode(np.concatenate(parts) if parts else np.zeros(0, np.uint64))


def decode_positions(pos_vb: bytes, tfs: np.ndarray) -> list[np.ndarray]:
    flat = varbyte_decode(pos_vb)
    out, off = [], 0
    for tf in np.asarray(tfs, dtype=np.int64):
        out.append(delta_decode(flat[off : off + tf]))
        off += tf
    return out


def tf_norm(tfs: np.ndarray, dls: np.ndarray, avgdl: float) -> np.ndarray:
    """BM25 term-frequency component (idf excluded — idf is a per-term
    constant applied at query time, so stored block bounds stay valid
    without a global-df join at encode time)."""
    tfs = np.asarray(tfs, dtype=np.float64)
    dls = np.asarray(dls, dtype=np.float64)
    return tfs * (K1 + 1.0) / (tfs + K1 * (1.0 - B + B * dls / avgdl))


def block_maxes(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, avgdl: float,
    block_size: int = BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-block metadata for block-max WAND: (block_last_docid,
    block_max_tf_norm).  Query-time upper bound for a block is
    ``idf(term) * block_max_tf_norm`` — exact under build-time stats."""
    n = len(doc_ids)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    norms = tf_norm(tfs, dls, avgdl)
    nblocks = (n + block_size - 1) // block_size
    last = np.zeros(nblocks, dtype=np.int64)
    ub = np.zeros(nblocks, dtype=np.float64)
    for b in range(nblocks):
        s, e = b * block_size, min((b + 1) * block_size, n)
        last[b] = doc_ids[e - 1]
        ub[b] = norms[s:e].max()
    return last, ub
