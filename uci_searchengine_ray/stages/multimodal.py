"""Multimodal columns: opaque ``binary`` payloads with typed metadata, decoded
/ feature-extracted in actor-pool map_batches stages.

The image/audio LIBRARIES are not available in this container, so the default
decode is a clearly-marked deterministic fake (sha256-derived dimensions) —
but the Ray-side plumbing is real and tested: binary column handling (stays
in Arrow, never pandas), bounded batch sizes for large payloads, actor-pool
stage shape (decoder "loaded" once per actor), typed output schema.  The
OPT-IN ``use_real_decode=True`` path is a genuine pixel decode with no
external dependency: a pure-numpy PPM(P6)/BMP codec plus an 8×8 mean-pooled
thumbnail hash (functions/imagecodec.py), exercised end-to-end through the
actor pool in tests/test_dedup_sim.py.

The fake-decode formulas are deliberately SQL-expressible so the driver's
DuckDB oracle can verify the plumbing end-to-end:
  width  = 1 + hex(sha256(payload)[0:8])  % 1920
  height = 1 + hex(sha256(payload)[8:16]) % 1080
  n_frames (video) = 1 + n_bytes % 240;  sample_rate (audio) = 16000
"""

from __future__ import annotations

import hashlib
import pyarrow as pa

MM_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("modality", pa.string()),
        ("n_bytes", pa.int64()),
        ("width", pa.int64()),
        ("height", pa.int64()),
        ("n_frames", pa.int64()),
        ("duration_s", pa.float64()),
        ("thumb_sha256", pa.string()),
    ]
)


def text_to_payload(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stand-in ingest: utf-8 bytes of text as the opaque binary payload
    (real corpora would carry image/audio bytes in this column)."""
    payloads = [
        (t or "").encode("utf-8") for t in batch[text_col].to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": pa.array(payloads, pa.large_binary()),
        }
    )


class MultimodalFeatures:
    """Actor-pool decode/feature stage.

    ``__init__`` loads the decoder once per actor.  With PIL/librosa absent
    (this container), ``self.real_decode`` is False and a deterministic fake
    decode produces the metadata; the batch plumbing is identical either way.
    """

    def __init__(self, modality: str = "image", use_real_decode: bool = False):
        self.modality = modality
        self.real_decode = False
        if use_real_decode:  # explicit opt-in; never the default
            if modality != "image":
                raise ValueError(
                    "real decode is implemented for modality='image' only "
                    "(PPM/BMP via functions/imagecodec.py; audio/video "
                    "libraries are not available in this container)"
                )
            # decoder "loaded" once per actor — PIL is absent here, so the
            # real path is the pure-numpy PPM/BMP codec
            from ..functions import imagecodec

            self._codec = imagecodec
            self.real_decode = True

    def _fake_decode(self, payload: bytes) -> dict:
        h = hashlib.sha256(payload).hexdigest()
        n = len(payload)
        width = 1 + int(h[0:8], 16) % 1920
        height = 1 + int(h[8:16], 16) % 1080
        n_frames = 1 + n % 240 if self.modality == "video" else 1
        duration = round(n / 16000.0, 6) if self.modality == "audio" else 0.0
        thumb = hashlib.sha256(payload[:64]).hexdigest()
        return dict(
            n_bytes=n, width=width, height=height, n_frames=n_frames,
            duration_s=duration, thumb_sha256=thumb,
        )

    def _image_decode(self, payload: bytes) -> dict:
        """REAL decode + feature extract: header-parsed dimensions and an
        8×8 mean-pooled grayscale thumbnail hash over the decoded pixels
        (functions/imagecodec.py — PPM P6 / uncompressed BMP).

        Undecodable payloads (null/empty rows, unsupported formats) are
        QUARANTINED, not raised: they emit width=height=n_frames=0 and an
        empty thumb_sha256 so one bad row cannot kill the map task — the
        downstream filter ``width > 0`` is the keep-list, mirroring the
        docstore's failed-fetch marker semantics."""
        try:
            img = self._codec.decode_image(payload)
        except ValueError:
            return dict(
                n_bytes=len(payload), width=0, height=0, n_frames=0,
                duration_s=0.0, thumb_sha256="",
            )
        return dict(
            n_bytes=len(payload),
            width=int(img.shape[1]),
            height=int(img.shape[0]),
            n_frames=1,
            duration_s=0.0,
            thumb_sha256=self._codec.thumb_sha256(img),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = self._image_decode if self.real_decode else self._fake_decode
        feats = [decode(p or b"") for p in batch["payload"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "modality": pa.array([self.modality] * len(feats), pa.string()),
                "n_bytes": pa.array([f["n_bytes"] for f in feats], pa.int64()),
                "width": pa.array([f["width"] for f in feats], pa.int64()),
                "height": pa.array([f["height"] for f in feats], pa.int64()),
                "n_frames": pa.array([f["n_frames"] for f in feats], pa.int64()),
                "duration_s": pa.array([f["duration_s"] for f in feats], pa.float64()),
                "thumb_sha256": pa.array([f["thumb_sha256"] for f in feats], pa.string()),
            },
            schema=MM_SCHEMA,
        )


def multimodal_features(
    docs: "object", modality: str = "image", batch_size: int = 64,
    concurrency: int = 2, use_real_decode: bool = False,
):
    """documents → payload → actor-pool feature extraction.

    batch_size is deliberately small: binary payloads are wide rows, and a
    batch × concurrency must fit in a worker heap at real payload sizes.
    """
    payloads = docs.map_batches(
        text_to_payload, batch_format="pyarrow", zero_copy_batch=True
    )
    return payloads.map_batches(
        MultimodalFeatures,
        fn_constructor_kwargs=dict(
            modality=modality, use_real_decode=use_real_decode
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
