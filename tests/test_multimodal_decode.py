"""Real-decode path of the multimodal stage (VERDICT r3 #7): actual pixel
bytes (PPM P6 / uncompressed BMP, pure-numpy codec) decoded and
feature-extracted end-to-end through the Ray actor pool — the gate keeps
the deterministic fake; this pins the opt-in real path."""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pytest

from uci_searchengine_ray.functions import imagecodec


def _gradient(h: int, w: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 255 // max(w - 1, 1)), (y * 255 // max(h - 1, 1)),
         ((x + y) % 256)],
        axis=2,
    ).astype(np.uint8)


def _encode_bmp(img: np.ndarray) -> bytes:
    """Minimal bottom-up 24-bit BI_RGB BMP writer (test-side ground truth)."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for row in img[::-1]:  # bottom-up
        line = row[:, ::-1].tobytes()  # RGB → BGR
        raster += line + b"\x00" * (stride - len(line))
    off = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", off + len(raster), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster),
                      2835, 2835, 0, 0)
        + bytes(raster)
    )


def test_ppm_roundtrip_and_bmp_decode():
    img = _gradient(13, 9)
    assert np.array_equal(
        imagecodec.decode_ppm(imagecodec.encode_ppm(img)), img
    )
    assert np.array_equal(imagecodec.decode_bmp(_encode_bmp(img)), img)
    # dispatch + failure mode
    assert imagecodec.decode_image(imagecodec.encode_ppm(img)).shape == (13, 9, 3)
    with pytest.raises(ValueError, match="unsupported"):
        imagecodec.decode_image(b"GIF89a not supported")


def test_real_decode_through_actor_pool(ray_session):
    import ray.data

    from uci_searchengine_ray.stages.multimodal import MultimodalFeatures

    imgs = [_gradient(8 + i, 6 + 2 * i) for i in range(7)]
    payloads = [
        imagecodec.encode_ppm(im) if i % 2 == 0 else _encode_bmp(im)
        for i, im in enumerate(imgs)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(imgs), dtype=np.int64)),
                "payload": pa.array(payloads, pa.large_binary()),
            }
        )
    )
    out = (
        ds.map_batches(
            MultimodalFeatures,
            fn_constructor_kwargs=dict(modality="image", use_real_decode=True),
            batch_format="pyarrow",
            batch_size=2,
            concurrency=2,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, im in enumerate(imgs):
        assert out.loc[i, "width"] == im.shape[1]
        assert out.loc[i, "height"] == im.shape[0]
        assert out.loc[i, "n_bytes"] == len(payloads[i])
        assert out.loc[i, "thumb_sha256"] == imagecodec.thumb_sha256(im)
    # PPM and BMP encodings of the SAME pixels extract the same thumbnail
    assert (
        imagecodec.thumb_sha256(imgs[0]) ==
        imagecodec.thumb_sha256(
            imagecodec.decode_bmp(_encode_bmp(imgs[0]))
        )
    )


def test_real_decode_rejects_non_image_modalities():
    from uci_searchengine_ray.stages.multimodal import MultimodalFeatures

    with pytest.raises(ValueError, match="image"):
        MultimodalFeatures(modality="audio", use_real_decode=True)


def test_real_decode_quarantines_bad_payloads(ray_session):
    """One undecodable row must not kill the task: null/empty/unsupported
    payloads emit width=height=0 and empty thumb (the quarantine marker)
    while good rows in the same batch decode normally."""
    import ray.data

    from uci_searchengine_ray.stages.multimodal import MultimodalFeatures

    good = _gradient(5, 4)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "payload": pa.array(
                    [imagecodec.encode_ppm(good), b"", None,
                     b"\xff\xd8\xff jpeg-ish"],
                    pa.large_binary(),
                ),
            }
        )
    )
    out = (
        ds.map_batches(
            MultimodalFeatures,
            fn_constructor_kwargs=dict(modality="image", use_real_decode=True),
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out.loc[0, "width"] == 4 and out.loc[0, "height"] == 5
    assert (out.loc[1:, "width"] == 0).all()
    assert (out.loc[1:, "thumb_sha256"] == "").all()


def test_ppm_maxval_rescale():
    """Spec-valid P6 with maxval<255: sample values are relative to maxval,
    so a full-intensity pixel must decode to 255, not the raw value."""
    hdr = b"P6\n2 1\n15\n"
    img = imagecodec.decode_ppm(hdr + bytes([15, 0, 15, 3, 3, 3]))
    assert img.tolist() == [[[255, 0, 255], [51, 51, 51]]]
