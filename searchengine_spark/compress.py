"""Posting-list physical format: delta + varbyte compression, block-max
metadata (SURVEY.md §4.2 item 1).

There is no Spark primitive for this; blobs are built with numpy inside
``applyInPandas`` per (term, salt) partition and stored as parquet BINARY
columns. Layout per posting list (always sorted by doc_id ascending):

* ``doc_ids``: uint64 view of the signed 64-bit doc_id biased by 2^63
  (preserves signed order), delta-encoded, varbyte.
* ``tfs``: term frequencies, varbyte (no delta).
* block metadata every ``BLOCK`` postings: (last_doc signed i64,
  max_tf_norm float32) where max_tf_norm is the max of
  tf/(tf + k1*(1-b+b*dl/avgdl)) in the block — multiplying by the term's
  idf*(k1+1) gives the exact block-max BM25 partial score used by WAND.

Varbyte: little-endian 7-bit groups, high bit set on all but the last
byte of each value. Both encode and decode are fully vectorized.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128
_BIAS = np.uint64(1) << np.uint64(63)


def to_unsigned(doc_ids: np.ndarray) -> np.ndarray:
    """Signed i64 doc_ids -> order-preserving u64."""
    return doc_ids.astype(np.int64).view(np.uint64) + _BIAS


def to_signed(u: np.ndarray) -> np.ndarray:
    return (u - _BIAS).view(np.int64)


def varbyte_nbytes(values: np.ndarray) -> np.ndarray:
    """Encoded byte length of each value: ceil(bit_length/7), min 1."""
    v = values.astype(np.uint64, copy=True)
    nbits = np.zeros(len(v), dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 7
        tmp >>= np.uint64(7)
    return np.maximum(nbits // 7, 1)


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte encode of a uint64 array."""
    v = values.astype(np.uint64, copy=True)
    if len(v) == 0:
        return b""
    nbytes = varbyte_nbytes(v)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    # position of the FIRST byte of each value
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    # byte slot index within each value via repeat trick
    idx = np.arange(total) - np.repeat(starts, nbytes)  # 0..nbytes-1
    val_rep = np.repeat(v, nbytes)
    shifts = (idx * 7).astype(np.uint64)
    chunks = ((val_rep >> shifts) & np.uint64(0x7F)).astype(np.uint8)
    # continuation bit on every byte except the last of each value
    last = np.zeros(total, dtype=bool)
    last[np.cumsum(nbytes) - 1] = True
    chunks[~last] |= 0x80
    out[:] = chunks
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Vectorized varbyte decode -> uint64 array."""
    if not buf:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    is_last = (raw & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    n = len(ends)
    idx = np.arange(len(raw)) - np.repeat(starts, ends - starts + 1)
    shifts = (idx * 7).astype(np.uint64)
    contrib = (raw & np.uint64(0x7F)).astype(np.uint64) << shifts
    group = np.repeat(np.arange(n), ends - starts + 1)
    out = np.zeros(n, dtype=np.uint64)
    np.add.at(out, group, contrib)
    return out


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, tf_norms: np.ndarray
) -> tuple[bytes, bytes, np.ndarray, np.ndarray, np.ndarray]:
    """Compress one sorted posting list.

    Returns (doc_blob, tf_blob, block_last_doc i64, block_max_norm f32,
    (doc_boff, tf_boff)) — the byte offset where each block's varbytes
    START inside its blob, so a reader can decode one block without
    touching the rest (skip decoding: block i spans boff[i]:boff[i+1],
    the final block ends at len(blob)).
    """
    assert doc_ids.dtype == np.int64
    u = to_unsigned(doc_ids)
    deltas = np.empty_like(u)
    deltas[0] = u[0]
    deltas[1:] = u[1:] - u[:-1]
    doc_blob = varbyte_encode(deltas)
    tf_blob = varbyte_encode(tfs.astype(np.uint64))
    n = len(doc_ids)
    n_blocks = (n + BLOCK - 1) // BLOCK
    block_last = np.empty(n_blocks, dtype=np.int64)
    block_max = np.empty(n_blocks, dtype=np.float32)
    for b in range(n_blocks):
        lo, hi = b * BLOCK, min((b + 1) * BLOCK, n)
        block_last[b] = doc_ids[hi - 1]
        block_max[b] = tf_norms[lo:hi].max()
    doc_boff = block_byte_offsets(varbyte_nbytes(deltas))
    tf_boff = block_byte_offsets(varbyte_nbytes(tfs.astype(np.uint64)))
    return doc_blob, tf_blob, block_last, block_max, (doc_boff, tf_boff)


def block_byte_offsets(nbytes: np.ndarray, block: int = BLOCK) -> np.ndarray:
    """Byte offset of the first varbyte of every ``block``-th value."""
    cum = np.concatenate(([0], np.cumsum(nbytes)))
    return cum[::block][: (len(nbytes) + block - 1) // block].astype(np.int64)


def decode_block(
    blob: bytes, boff: np.ndarray, block_idx: int
) -> np.ndarray:
    """Decode only block ``block_idx`` of a blob (raw varbyte values —
    deltas for doc blobs; the caller re-bases with the previous block's
    last absolute value)."""
    lo = int(boff[block_idx])
    hi = int(boff[block_idx + 1]) if block_idx + 1 < len(boff) else len(blob)
    return varbyte_decode(blob[lo:hi])


def encode_position_lists(plists: np.ndarray) -> bytes:
    """Encode per-posting position lists as the concatenation of
    ``[n, delta1..deltan]`` per list (the ``pos_blob`` layout), fully
    vectorized across the group — one Python step per LIST only in the
    length scan and the flatten, everything else whole-array numpy.
    Byte-identical to encoding each list separately and concatenating.
    """
    nrows = len(plists)
    if nrows == 0:
        return b""
    lens = np.fromiter((len(x) for x in plists), np.int64, nrows)
    total = int(lens.sum())
    if total == 0:
        return varbyte_encode(np.zeros(nrows, np.uint64))
    flat = np.concatenate([np.asarray(x, np.int64) for x in plists])
    offsets = np.zeros(nrows + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    deltas = np.empty(total, np.int64)
    deltas[1:] = flat[1:] - flat[:-1]
    starts = offsets[:-1][lens > 0]  # first element of each list is absolute
    deltas[starts] = flat[starts]
    out = np.empty(total + nrows, np.int64)
    cnt_pos = offsets[:-1] + np.arange(nrows)  # count precedes each list
    out[cnt_pos] = lens
    mask = np.ones(total + nrows, dtype=bool)
    mask[cnt_pos] = False
    out[mask] = deltas
    return varbyte_encode(out.astype(np.uint64))


def decode_postings(doc_blob: bytes, tf_blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decompress -> (doc_ids i64 sorted, tfs i64)."""
    deltas = varbyte_decode(doc_blob)
    u = np.cumsum(deltas, dtype=np.uint64)
    tfs = varbyte_decode(tf_blob).astype(np.int64)
    return to_signed(u), tfs
