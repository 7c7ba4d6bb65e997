"""Chunker semantics vs the reference extractor/splitter
(reference dataloader/SMS_WSJ.py:79-228, dataloader/data.py:524-597)."""

import numpy as np

from misonet_tpu.ops import split_chunks, merge_chunks, train_chunks

CHUNK, LEAST = 32000, 16000


def test_train_chunks_overlap():
    x = np.arange(80000, dtype=np.float32)
    chunks = train_chunks(x, CHUNK, LEAST)
    # windows at 0, 16000, 32000, 48000, 64000 (last one zero-padded)
    assert all(c.shape == (CHUNK,) for c in chunks)
    assert chunks[0][0] == 0 and chunks[1][0] == LEAST
    assert len(chunks) == 5
    assert chunks[-1][LEAST:].sum() == 0


def test_train_chunks_short_padded_and_dropped():
    assert len(train_chunks(np.ones(LEAST - 1, np.float32), CHUNK, LEAST)) == 0
    c = train_chunks(np.ones(LEAST + 5, np.float32), CHUNK, LEAST)
    assert len(c) == 1 and c[0].shape == (CHUNK,)
    assert c[0][LEAST + 5 :].sum() == 0  # zero padded tail


def test_split_merge_roundtrip():
    x = np.random.default_rng(0).standard_normal((70000, 6)).astype(np.float32)
    pieces, gap = split_chunks(x, CHUNK)
    assert pieces.shape == (3, CHUNK, 6) and gap == 3 * CHUNK - 70000
    np.testing.assert_array_equal(merge_chunks(pieces, gap), x)


def test_split_exact_multiple_no_gap():
    """length == n*chunk must produce gap 0 (the reference crashes here:
    data.py:597 leaves `gap` unbound, SURVEY.md §2.5)."""
    x = np.ones((2 * CHUNK,), np.float32)
    pieces, gap = split_chunks(x, CHUNK)
    assert pieces.shape[0] == 2 and gap == 0
    np.testing.assert_array_equal(merge_chunks(pieces, gap), x)
