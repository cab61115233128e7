"""Minimal REAL image decoders (pure numpy, no external image library):
binary PPM (P6) and uncompressed 24/32-bit BMP — enough to exercise the
multimodal actor-pool plumbing end-to-end on real pixel bytes in this
container (PIL is not installed; reference parity needs only the decode →
feature-extract stage SHAPE, stages/multimodal.py).

Both formats are trivially verifiable: dimensions come from the header,
pixels are raw rows.  ``decode_image`` dispatches on magic bytes and
raises ``ValueError`` on anything else (a real corpus pipeline would list
the unsupported payload in a quarantine column, as the docstore does for
failed fetches).
"""

from __future__ import annotations

import hashlib

import numpy as np

THUMB_SIDE = 8


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6) bytes.  Test/ingest helper."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_ppm expects (h, w, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval ≤ 255) → (h, w, 3) uint8."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval — whitespace/comment separated
    fields: list = []
    i = 2
    n = len(payload)
    while len(fields) < 3 and i < n:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < n and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255 or maxval < 1:
        raise ValueError("16-bit PPM not supported")
    need = w * h * 3
    raster = payload[i : i + need]
    if len(raster) != need:
        raise ValueError("truncated PPM raster")
    img = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    if maxval != 255:  # spec: sample values are relative to maxval
        img = np.round(
            img.astype(np.float64) * (255.0 / maxval)
        ).astype(np.uint8)
    return img


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB BMP → (h, w, 3) uint8 (BGR→RGB,
    bottom-up rows flipped)."""
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError("BMP core header not supported")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flip = h > 0
    h = abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    rows = np.frombuffer(
        payload[off : off + stride * h], dtype=np.uint8
    ).reshape(h, stride)
    img = rows[:, : w * nb].reshape(h, w, nb)[:, :, :3][:, :, ::-1]
    return (img[::-1] if flip else img).copy()


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes → (h, w, 3) uint8 RGB."""
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if payload.startswith(b"BM"):
        return decode_bmp(payload)
    raise ValueError("unsupported image payload (PPM P6 / BMP supported)")


def thumbnail_gray(img: np.ndarray, side: int = THUMB_SIDE) -> np.ndarray:
    """``side``×``side`` mean-pooled grayscale thumbnail (uint8) — the
    feature-extract step run on the DECODED pixels (block-mean over an
    even grid; edge blocks absorb the remainder)."""
    g = img.astype(np.float64).mean(axis=2)
    h, w = g.shape
    ye = np.linspace(0, h, side + 1).astype(np.int64)
    xe = np.linspace(0, w, side + 1).astype(np.int64)
    out = np.empty((side, side), dtype=np.float64)
    for a in range(side):
        ys = slice(ye[a], max(ye[a + 1], ye[a] + 1))
        for b in range(side):
            xs = slice(xe[b], max(xe[b + 1], xe[b] + 1))
            out[a, b] = g[ys, xs].mean()
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def thumb_sha256(img: np.ndarray) -> str:
    return hashlib.sha256(thumbnail_gray(img).tobytes()).hexdigest()
