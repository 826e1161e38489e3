"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with typed
metadata columns alongside.  Decode / feature-extract stages are
actor-pool ``map_batches`` stages whose Ray-side plumbing (schema, small
batch size for wide binary rows, actor signature, output layout) is real
and tested; the actual codec call is stubbed because no image/audio
libraries exist in this container:

- ``decoder="fake"`` (default): deterministic stand-in that derives a
  fixed-size feature vector from the payload bytes (sha256-seeded), so
  the pipeline shape is exercised end-to-end.
- ``decoder="pil"``: raises NotImplementedError at actor construction
  unless PIL is importable (the real path on a production image).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

FEATURE_DIM = 16


class MediaFeatureStage:
    """Actor-pool stage: payload binary -> feature vector (list<float>).

    Use small batch_size (payload rows are wide) and
    ``concurrency=(1, N)`` pools.  Setup (codec import / model load)
    happens once per actor here in __init__.
    """

    def __init__(self, decoder: str = "fake"):
        self.decoder = decoder
        if decoder == "pil":
            try:
                import PIL.Image  # noqa: F401
            except ImportError as e:  # pragma: no cover - no PIL in container
                raise NotImplementedError(
                    "real image decode requires PIL, which is not available "
                    "in this environment; use decoder='fake'"
                ) from e
        elif decoder != "fake":
            raise ValueError(f"unknown decoder {decoder!r}")

    def _fake_features(self, payload: bytes) -> np.ndarray:
        # deterministic: 16 floats derived from the sha256 of the payload
        digest = hashlib.sha256(payload).digest()
        raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype="<u2")
        return (raw.astype(np.float64) / 65535.0).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._fake_features(p) for p in batch["payload"].to_pylist()
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


def extract_media_features(media_ds, decoder: str = "fake", concurrency=(1, 4)):
    return media_ds.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=64,  # wide binary rows -> small batches
        concurrency=concurrency,
    )


class FrameSampleStage:
    """Actor-pool stage: video payload -> one row PER SAMPLED FRAME
    (flat_map shape: the output row count differs from the input's).

    A real implementation seeks ``fps``-spaced keyframes with a codec
    loaded once per actor; here the deterministic stand-in slices the
    payload into ``n_frames`` chunks so schema, fan-out ratio, batch
    sizing and the downstream per-frame feature join are exercised
    end-to-end."""

    def __init__(self, n_frames: int = 4, decoder: str = "fake"):
        if decoder == "pyav":
            try:
                import av  # noqa: F401
            except ImportError as e:  # pragma: no cover - no codecs here
                raise NotImplementedError(
                    "real frame sampling requires PyAV; use decoder='fake'"
                ) from e
        elif decoder != "fake":
            raise ValueError(f"unknown decoder {decoder!r}")
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_no, frames = [], [], []
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "video" or not payload:
                continue
            step = max(1, len(payload) // self.n_frames)
            for f in range(self.n_frames):
                chunk = payload[f * step : (f + 1) * step]
                if not chunk:
                    break
                ids.append(int(mid))
                frame_no.append(f)
                frames.append(chunk)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_no": pa.array(frame_no, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def sample_video_frames(media_ds, n_frames: int = 4, concurrency=(1, 4)):
    """Video rows -> per-frame rows, then reusable by the feature stage
    (frame-sample -> decode -> feature is the canonical video pipeline)."""
    return media_ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=16,  # video payloads are the widest rows
        concurrency=concurrency,
    )


def synth_media_table(n: int = 32, seed: int = 5) -> pa.Table:
    """Deterministic fake media table for tests."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(128 + 16 * i) for i in range(n)]
    kinds = ["image", "audio", "video"]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array([kinds[i % 3] for i in range(n)], pa.string()),
            "mime": pa.array(["application/octet-stream"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([64] * n, pa.int32()),
            "height": pa.array([64] * n, pa.int32()),
        }
    )
