"""varbyte/delta round-trip fixtures (SURVEY.md §5.1, FIXTURES.md §5)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from uci_searchengine_ray.functions import codecs


@pytest.mark.parametrize(
    "values",
    [
        [],
        [0],
        [1],
        [127],
        [128],
        [16383],
        [16384],
        [2**62],
        [0, 1, 2, 3],
        list(range(1000)),
        [5, 1_000_000_000, 2**55],
    ],
)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert codecs.varbyte_decode(codecs.varbyte_encode(arr)).tolist() == values


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_varbyte_roundtrip_fuzz(values):
    arr = np.array(values, dtype=np.uint64)
    assert codecs.varbyte_decode(codecs.varbyte_encode(arr)).tolist() == values


@pytest.mark.parametrize(
    "ids",
    [
        [7],
        [0, 1, 2, 3],             # gap=1 runs
        [3, 10, 11, 5000, 2**40],  # large gaps
        list(range(100, 600, 7)),
    ],
)
def test_delta_ids_roundtrip(ids):
    arr = np.array(ids, dtype=np.int64)
    assert codecs.decode_ids(codecs.encode_ids(arr)).tolist() == ids


def test_delta_rejects_unsorted():
    with pytest.raises(ValueError):
        codecs.delta_encode(np.array([3, 3], dtype=np.int64))
    with pytest.raises(ValueError):
        codecs.delta_encode(np.array([5, 4], dtype=np.int64))


@settings(max_examples=200, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**50), min_size=1, max_size=300))
def test_delta_roundtrip_fuzz(idset):
    ids = np.array(sorted(idset), dtype=np.int64)
    assert codecs.decode_ids(codecs.encode_ids(ids)).tolist() == ids.tolist()


def test_compression_is_compact():
    """Dense ascending ids ≈ 1 byte/posting after delta+varbyte."""
    ids = np.arange(10_000, dtype=np.int64)
    assert len(codecs.encode_ids(ids)) < 11_000


def test_segmented_encode_matches_per_segment():
    import numpy as np

    from uci_searchengine_ray.functions import codecs

    rng = np.random.default_rng(7)
    # many tiny segments with mixed magnitudes (1-byte and multi-byte values)
    segs = []
    for _ in range(200):
        n = int(rng.integers(1, 6))
        ids = np.sort(rng.integers(0, 1 << 40, size=n, dtype=np.int64))
        ids = np.unique(ids)
        tfs = rng.integers(1, 300, n).astype(np.int64)
        segs.append((ids, tfs))
    flat_ids = np.concatenate([s[0] for s in segs])
    flat_tfs = np.concatenate([s[1] for s in segs])
    starts = np.cumsum([0] + [len(s[0]) for s in segs[:-1]])

    got_ids = codecs.varbyte_encode_segments(
        codecs.delta_encode_segments(flat_ids, starts), starts
    )
    got_tfs = codecs.varbyte_encode_segments(flat_tfs, starts)
    for i, (ids, tfs) in enumerate(segs):
        assert got_ids[i] == codecs.encode_ids(ids)
        assert got_tfs[i] == codecs.encode_plain(tfs)
        assert list(codecs.decode_ids(got_ids[i])) == list(ids)


def test_segmented_delta_rejects_descending_within_segment():
    import numpy as np
    import pytest

    from uci_searchengine_ray.functions import codecs

    with pytest.raises(ValueError):
        codecs.delta_encode_segments(
            np.array([1, 5, 3], dtype=np.int64), np.array([0])
        )
    # descending ACROSS a segment boundary is fine (segments are independent)
    out = codecs.delta_encode_segments(
        np.array([10, 20, 3, 9], dtype=np.int64), np.array([0, 2])
    )
    assert list(out) == [10, 10, 3, 6]
