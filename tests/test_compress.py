"""Property tests for the posting-list physical format (SURVEY.md §5.4)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_spark.compress import (
    BLOCK,
    decode_postings,
    encode_postings,
    to_signed,
    to_unsigned,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=400))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (varbyte_decode(varbyte_encode(arr)) == arr).all()


@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=500,
        unique=True,
    ),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(doc_ids, data):
    docs = np.array(sorted(doc_ids), dtype=np.int64)
    tfs = np.array(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=10000),
                min_size=len(docs),
                max_size=len(docs),
            )
        ),
        dtype=np.int64,
    )
    norms = tfs / (tfs + 1.5)
    doc_blob, tf_blob, block_last, block_max, block_off = encode_postings(
        docs, tfs, norms
    )
    d2, t2 = decode_postings(doc_blob, tf_blob)
    assert (d2 == docs).all()
    assert (t2 == tfs).all()
    # block metadata invariants
    n_blocks = (len(docs) + BLOCK - 1) // BLOCK
    assert len(block_last) == n_blocks
    assert block_last[-1] == docs[-1]
    for b in range(n_blocks):
        lo, hi = b * BLOCK, min((b + 1) * BLOCK, len(docs))
        assert block_last[b] == docs[hi - 1]
        assert abs(block_max[b] - norms[lo:hi].max()) < 1e-6


def test_signed_unsigned_order_preserving():
    xs = np.array([-(2**63), -1, 0, 1, 2**63 - 1], dtype=np.int64)
    u = to_unsigned(xs)
    assert (np.diff(u.astype(object)) > 0).all()
    assert (to_signed(u) == xs).all()


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=1 << 20), max_size=40).map(
            sorted
        ),
        max_size=60,
    )
)
def test_encode_position_lists_matches_scalar_reference(plists):
    """Vectorized pos_blob encoding is byte-identical to encoding each
    list separately (the pre-r2 scalar kernel), including empty lists
    (encoded as a bare 0 count)."""
    from searchengine_spark.compress import encode_position_lists

    parts = []
    for plist in plists:
        arr = np.asarray(plist, dtype=np.int64)
        if len(arr):
            deltas = np.empty_like(arr)
            deltas[0] = arr[0]
            deltas[1:] = arr[1:] - arr[:-1]
            parts.append(np.concatenate(([len(arr)], deltas)).astype(np.uint64))
        else:
            parts.append(np.zeros(1, dtype=np.uint64))
    expected = varbyte_encode(np.concatenate(parts)) if parts else b""
    got = encode_position_lists(
        np.array([np.asarray(p, dtype=np.int64) for p in plists], dtype=object)
    )
    assert got == expected
