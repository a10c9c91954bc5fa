"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch
shapes, partition-friendly mapInPandas kernels; the codec step itself
is stubbed behind ``NotImplementedError`` or a deterministic fake
because the sandbox has no image/audio libraries. Swapping in PIL/
torchaudio touches ONLY the two ``_decode_*_real`` functions; batch
shape, schema, and the pipeline around them stay as-is.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "mime string, width int, height int, duration_ms int")

IMAGE_FEATURES_SCHEMA = ("media_id long, sha256 string, n_bytes int, "
                         "thumb_w int, thumb_h int, features array<float>")

FRAME_SAMPLE_SCHEMA = ("media_id long, frame_no int, ts_ms int, "
                       "frame_sha string")


def _decode_image_real(payload: bytes):  # pragma: no cover
    """Real decoder seam: PIL.Image.open(io.BytesIO(payload))."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "deterministic fake used instead (decode_fake=True)")


def _fake_image_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in 'decode': derive (w, h) from a stable
    digest so tests and oracles are reproducible."""
    d = hashlib.sha256(payload).digest()
    w = 16 + (struct.unpack(">H", d[0:2])[0] % 1024)
    h = 16 + (struct.unpack(">H", d[2:4])[0] % 1024)
    return w, h


def synth_media_rows(n: int = 64, seed: int = 42) -> list[tuple]:
    """Deterministic opaque binary payloads standing in for media files
    — pure function, shared by the Spark source and the single-threaded
    oracle twin so both sides see byte-identical payloads."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        payload = rng.bytes(128 + int(rng.randint(0, 512)))
        kind = ("image", "audio", "video")[i % 3]
        rows.append((i, kind, bytearray(payload), f"application/x-{kind}",
                     None, None, None))
    return rows


def synth_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(synth_media_rows(n, seed), MEDIA_SCHEMA)


def image_feature_record(payload: bytes, thumb: int = 8) -> dict:
    """Per-image feature kernel (fake codec path): pure, deterministic,
    shared by the mapInPandas UDF and the DuckDB VALUES oracle."""
    w, h = _fake_image_meta(payload)
    d = hashlib.sha256(b"feat" + payload).digest()
    feat = (np.frombuffer(d, dtype=np.uint8)[:thumb * thumb // 2]
            .astype(np.float32) / 255.0)
    return {"sha256": hashlib.sha256(payload).hexdigest(),
            "n_bytes": len(payload),
            "thumb_w": min(w, thumb), "thumb_h": min(h, thumb),
            "features": feat.tolist()}


def video_frame_records(payload: bytes, every_ms: int = 1000,
                        max_frames: int = 8) -> list[dict]:
    """Per-video frame-sample kernel (fake codec path): pure,
    deterministic, shared by the UDF and the oracle."""
    n = 1 + (payload[0] % max_frames) if payload else 1
    return [{"frame_no": f, "ts_ms": f * every_ms,
             "frame_sha": hashlib.sha256(
                 payload + f.to_bytes(4, "big")).hexdigest()}
            for f in range(n)]


def image_features(media: DataFrame, thumb: int = 8,
                   decode_fake: bool = True) -> DataFrame:
    """binary → per-image features. Real plumbing: column pruning into
    the UDF, one Arrow batch per task, fixed-length float feature
    vector out (ANN-ready). Fake codec: digest-seeded 'pixels'."""
    src = media.filter(F.col("kind") == "image") \
        .select("media_id", "payload")

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "sha256": [], "n_bytes": [],
                   "thumb_w": [], "thumb_h": [], "features": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                if not decode_fake:
                    _decode_image_real(data)  # raises: real codec absent
                rec = image_feature_record(data, thumb)
                out["media_id"].append(int(mid))
                out["sha256"].append(rec["sha256"])
                out["n_bytes"].append(rec["n_bytes"])
                out["thumb_w"].append(rec["thumb_w"])
                out["thumb_h"].append(rec["thumb_h"])
                out["features"].append(rec["features"])
            pdf_out = pd.DataFrame(out)
            pdf_out["n_bytes"] = pdf_out["n_bytes"].astype("int32")
            pdf_out["thumb_w"] = pdf_out["thumb_w"].astype("int32")
            pdf_out["thumb_h"] = pdf_out["thumb_h"].astype("int32")
            yield pdf_out

    return src.mapInPandas(_feat, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  max_frames: int = 8) -> DataFrame:
    """video binary → sampled frame records (1→N explode via
    mapInPandas). Frame 'decode' is a deterministic digest per
    (payload, frame_no) — the real path replaces one line."""
    src = media.filter(F.col("kind") == "video") \
        .select("media_id", "payload")

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "ts_ms": [],
                   "frame_sha": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for rec in video_frame_records(bytes(payload), every_ms,
                                               max_frames):
                    out["media_id"].append(int(mid))
                    out["frame_no"].append(rec["frame_no"])
                    out["ts_ms"].append(rec["ts_ms"])
                    out["frame_sha"].append(rec["frame_sha"])
            pdf_out = pd.DataFrame(out)
            pdf_out["frame_no"] = pdf_out["frame_no"].astype("int32")
            pdf_out["ts_ms"] = pdf_out["ts_ms"].astype("int32")
            yield pdf_out

    return src.mapInPandas(_frames, schema=FRAME_SAMPLE_SCHEMA)
