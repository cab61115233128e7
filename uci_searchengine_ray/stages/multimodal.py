"""Multimodal columns: opaque ``binary`` payloads with typed metadata, decoded
/ feature-extracted in actor-pool map_batches stages.

The image/audio libraries are not available in this container, so the DECODE
step is stubbed behind an import-try with a clearly-marked deterministic fake
(sha256-derived dimensions) — but the Ray-side plumbing is real and tested:
binary column handling (stays in Arrow, never pandas), bounded batch sizes for
large payloads, actor-pool stage shape (decoder "loaded" once per actor),
typed output schema.

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
            try:  # pragma: no cover - decoder libs absent in this environment
                import PIL.Image  # noqa: F401

                self.real_decode = True
            except ImportError:
                raise ImportError(
                    "use_real_decode=True requires PIL, which is not installed"
                )

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

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real_decode:  # pragma: no cover - PIL absent in this container
            raise NotImplementedError(
                "real PIL decode path not implemented in this container; "
                "construct with use_real_decode=False (the default) for the "
                "deterministic fake decoder, which exercises the same plumbing"
            )
        feats = [self._fake_decode(p or b"") for p in batch["payload"].to_pylist()]
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
    concurrency: int = 2
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
        fn_constructor_kwargs=dict(modality=modality),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
