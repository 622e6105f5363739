"""Native C++ data-kernel parity (kosmosx_tpu/data/native/packing.cpp).

The numpy implementations are the oracle; the native path must match them
byte-for-byte. group_texts must match the reference's concat-and-chunk
semantics (/root/reference/train.py:444-462) regardless of which path runs.
"""

import numpy as np
import pytest

from kosmosx_tpu.data import native
from kosmosx_tpu.train.data import device_prefetch, group_texts


def _rand_docs(rng, n, max_len=50):
    return [rng.randint(0, 1000, size=rng.randint(0, max_len)).astype(np.int32)
            for _ in range(n)]


def test_native_builds():
    # g++ is in the image; the shared library must build and load
    assert native.native_available()


@pytest.mark.parametrize("seq_len", [8, 128, 1000])
def test_pack_blocks_matches_numpy(seq_len):
    rng = np.random.RandomState(0)
    docs = _rand_docs(rng, 37)
    carry = rng.randint(0, 1000, size=seq_len - 3).astype(np.int32)
    blocks_n, tail_n = native.pack_blocks_np(docs, seq_len, 2, carry)
    blocks_c, tail_c = native.pack_blocks(docs, seq_len, 2, carry)
    np.testing.assert_array_equal(blocks_n, blocks_c)
    np.testing.assert_array_equal(tail_n, tail_c)


def test_pack_blocks_empty_and_carry_chain():
    blocks, tail = native.pack_blocks([], 16, 2)
    assert blocks.shape == (0, 16) and len(tail) == 0
    # chaining carries across calls == packing everything at once
    rng = np.random.RandomState(1)
    docs = _rand_docs(rng, 20)
    once, _ = native.pack_blocks_np(docs, 32, 2)
    carry = None
    chained = []
    for i in range(0, 20, 3):
        b, carry = native.pack_blocks(docs[i:i + 3], 32, 2, carry)
        chained.append(b)
    np.testing.assert_array_equal(once, np.concatenate(chained))


def test_pad_rows_matches_numpy():
    rng = np.random.RandomState(2)
    rows = _rand_docs(rng, 15, max_len=40)
    got = native.pad_rows(rows, 24, pad_id=1)
    np.testing.assert_array_equal(got, native.pad_rows_np(rows, 24, 1))
    assert got.dtype == np.int32 and got.shape == (15, 24)


def test_shift_labels_matches_numpy():
    rng = np.random.RandomState(3)
    ids = rng.randint(0, 50, size=(6, 33)).astype(np.int32)
    ids[:, -5:] = 1  # pad tail
    got = native.shift_labels(ids, pad_id=1)
    np.testing.assert_array_equal(got, native.shift_labels_np(ids, 1))
    assert (got[:, -1] == -100).all()


def test_group_texts_reference_semantics():
    # oracle: flat python concat+chunk, dropping the remainder (train.py:444-462)
    rng = np.random.RandomState(4)
    docs = _rand_docs(rng, 200, max_len=30)
    flat = []
    for d in docs:
        flat.extend(int(t) for t in d)
        flat.append(2)
    want = [np.asarray(flat[i:i + 64], np.int32)
            for i in range(0, (len(flat) // 64) * 64, 64)]
    got = list(group_texts(iter(docs), 64))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_group_texts_numpy_fallback(monkeypatch):
    monkeypatch.setattr(native, "_load", lambda: None)
    docs = [np.arange(10, dtype=np.int32)] * 13
    got = list(group_texts(iter(docs), 16))
    assert len(got) == (13 * 11) // 16


def test_device_prefetch_order_and_errors():
    out = list(device_prefetch(iter(range(10)), lambda x: x * 2, depth=3))
    assert out == [x * 2 for x in range(10)]

    def boom(x):
        if x == 3:
            raise ValueError("boom")
        return x

    with pytest.raises(ValueError, match="boom"):
        list(device_prefetch(iter(range(10)), boom))
