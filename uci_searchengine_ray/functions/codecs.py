"""Posting-list compression: delta + variable-byte (VByte) codecs, vectorized
with numpy.

The reference stores one SQLite row per posting (models.py:182-197) with no
compression and no ordering guarantee (SURVEY.md §2.6 K5).  The rebuild requires
doc_id-ascending posting blocks so gaps are small and delta+varbyte compresses
them; block metadata (last_doc, block_max score) enables block-max WAND skipping.

Encoding: classic VByte — 7 payload bits per byte, high bit set on the LAST
byte of each integer (terminator convention), little-endian payload order.

Both encode and decode are numpy-vectorized (no per-integer Python loop): the
encoder fills byte columns position-by-position (≤10 positions for uint64); the
decoder uses reduceat over terminator-delimited groups.
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 10  # ceil(64 / 7)


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative integers (< 2**63) to VByte bytes."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    if v.size and int(v.max()) >= (1 << 63):
        raise ValueError("varbyte_encode: values must be < 2**63")
    # number of 7-bit groups per value (at least 1)
    nbytes = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    # start offset of each value's byte run
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    rem = v.copy()
    for pos in range(int(nbytes.max())):
        mask = nbytes > pos
        idx = starts[mask] + pos
        payload = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        is_last = (nbytes[mask] == pos + 1).astype(np.uint8) << 7
        out[idx] = payload | is_last
        rem[mask] >>= np.uint64(7)
    return out.tobytes()


def varbyte_decode(data: bytes) -> np.ndarray:
    """Decode VByte bytes back to a uint64 array.

    Raises ``ValueError`` on a truncated stream (final byte lacks the
    terminator bit) — a corrupt index file must fail loudly, not decode to
    garbage doc_ids."""
    b = np.frombuffer(data, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    if not b[-1] & 0x80:
        raise ValueError(
            f"truncated varbyte stream ({b.size} bytes, unterminated tail)"
        )
    term = (b & 0x80) != 0
    ends = np.flatnonzero(term)
    starts = np.concatenate(([0], ends[:-1] + 1))
    payload = (b & np.uint8(0x7F)).astype(np.uint64)
    # shift of each byte = its offset within its value's run
    run_id = np.cumsum(term) - term  # index of the value each byte belongs to
    shifts = np.arange(b.size, dtype=np.int64) - starts[run_id]
    weighted = payload << shifts.astype(np.uint64) * np.uint64(7)
    return np.add.reduceat(weighted, starts)


def varbyte_encode_segments(
    values: np.ndarray, seg_starts: np.ndarray
) -> list:
    """One vectorized VByte pass over a CONCATENATION of segments, returning
    one ``bytes`` per segment — byte-identical to calling ``varbyte_encode``
    per segment, but with the numpy call overhead paid once for the whole
    batch instead of once per (tiny) run.  ``seg_starts`` are the segment
    start indices (first must be 0); the last segment ends at ``len(values)``.

    Motivation: phase-1 run encoding calls the codec ~30k times per 2k-doc
    batch on arrays of 1-5 values; per-call overhead was 65% of the whole
    tokenize stage (profiled) — this batches it away.
    """
    v = np.asarray(values, dtype=np.uint64)
    seg_starts = np.asarray(seg_starts, dtype=np.int64)
    if v.size == 0:
        return [b""] * len(seg_starts)
    if v.size and int(v.max()) >= (1 << 63):
        raise ValueError("varbyte_encode: values must be < 2**63")
    nbytes = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    rem = v.copy()
    for pos in range(int(nbytes.max())):
        mask = nbytes > pos
        idx = starts[mask] + pos
        payload = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        is_last = (nbytes[mask] == pos + 1).astype(np.uint8) << 7
        out[idx] = payload | is_last
        rem[mask] >>= np.uint64(7)
    blob = out.tobytes()
    byte_cuts = np.concatenate((starts[seg_starts], [total]))
    return [
        blob[byte_cuts[i] : byte_cuts[i + 1]] for i in range(len(seg_starts))
    ]


def delta_encode_segments(
    sorted_ids: np.ndarray, seg_starts: np.ndarray
) -> np.ndarray:
    """Per-segment delta encoding in one pass: within each segment the output
    is [first, gap1, ...] exactly like ``delta_encode`` on that slice."""
    a = np.asarray(sorted_ids, dtype=np.int64)
    seg_starts = np.asarray(seg_starts, dtype=np.int64)
    if a.size == 0:
        return a.astype(np.uint64)
    d = np.empty_like(a)
    d[0] = a[0]
    d[1:] = np.diff(a)
    d[seg_starts] = a[seg_starts]
    interior = np.ones(a.size, dtype=bool)
    interior[seg_starts] = False
    if interior.any() and int(d[interior].min()) <= 0:
        raise ValueError("delta_encode requires strictly ascending segments")
    if a.size and int(a[seg_starts].min()) < 0:
        raise ValueError("delta_encode requires non-negative ids")
    return d.astype(np.uint64)


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-ascending int array -> [first, gap1, gap2, ...] (gaps >= 1)."""
    a = np.asarray(sorted_ids, dtype=np.int64)
    if a.size == 0:
        return a.astype(np.uint64)
    d = np.diff(a)
    if a.size > 1 and int(d.min()) <= 0:
        raise ValueError("delta_encode requires strictly ascending input")
    if int(a[0]) < 0:
        raise ValueError("delta_encode requires non-negative ids")
    return np.concatenate(([a[0]], d)).astype(np.uint64)


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(deltas, dtype=np.uint64)).astype(np.int64)


def varbyte_decode_concat(blobs, counts: np.ndarray) -> np.ndarray:
    """Decode MANY varbyte blobs in one pass (terminator convention makes the
    concatenation decodable as a single stream).  ``counts`` is unused for
    decoding (values self-delimit) but validates the result length — the
    decode-side twin of ``varbyte_encode_segments`` for the phase-2 merge,
    where per-run decode calls dominated otherwise."""
    vals = varbyte_decode(b"".join(blobs))
    expect = int(np.asarray(counts).sum())
    if len(vals) != expect:
        raise ValueError(f"decoded {len(vals)} values, expected {expect}")
    return vals


def delta_decode_segments(
    deltas: np.ndarray, seg_starts: np.ndarray
) -> np.ndarray:
    """Per-segment delta decode in one pass: within each segment the output
    equals ``delta_decode`` of that slice (cumsum with resets)."""
    d = np.asarray(deltas, dtype=np.uint64)
    if d.size == 0:
        return d.astype(np.int64)
    seg_starts = np.asarray(seg_starts, dtype=np.int64)
    v = np.cumsum(d)
    seg_lens = np.diff(np.concatenate((seg_starts, [d.size])))
    base = np.zeros(len(seg_starts), dtype=np.uint64)
    base[1:] = v[seg_starts[1:] - 1]
    return (v - np.repeat(base, seg_lens)).astype(np.int64)


def encode_ids(sorted_ids: np.ndarray) -> bytes:
    """delta + varbyte for a strictly-ascending doc_id list."""
    return varbyte_encode(delta_encode(sorted_ids))


def decode_ids(data: bytes) -> np.ndarray:
    return delta_decode(varbyte_decode(data))


def encode_plain(values: np.ndarray) -> bytes:
    """varbyte without delta (for tf / doc_len payloads, small positives)."""
    return varbyte_encode(np.asarray(values, dtype=np.uint64))


def decode_plain(data: bytes) -> np.ndarray:
    return varbyte_decode(data).astype(np.int64)
