"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched mapInPandas operators.

The container has no image/audio libraries, so the *codec* layer is a
deterministic fake (FakeRAW: a 16-byte header + raw sample buffer,
synthesized by `synthesize_assets`). Everything Spark-side — schema,
partitioning, UDF signatures, batch shapes, vectorized math on the
decoded buffers — is real and tested; swapping `_decode_payload` for
PIL/libsndfile is the only production change (the import-try below
already probes for them).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - not present in this container
    import PIL.Image as _pil  # noqa: F401
    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

ASSET_SCHEMA_DDL = ("asset_id string, modality string, payload binary, "
                    "width int, height int, n_frames int, sample_rate int")
FEATURE_SCHEMA_DDL = ("asset_id string, modality string, n_bytes long, "
                      "content_md5 string, mean_level double, byte_entropy double")
RESIZED_SCHEMA_DDL = ("asset_id string, width int, height int, payload binary")
FRAMES_SCHEMA_DDL = ("asset_id string, frame_index int, payload binary")

MAGIC = b"FKRW"  # FakeRAW container


def _fake_payload(rng: np.random.Generator, modality: str,
                  w: int, h: int, frames: int) -> bytes:
    body = rng.integers(0, 256, w * h * frames).astype(np.uint8)
    hdr = MAGIC + struct.pack("<HHHH", w, h, frames, 0)
    return hdr + body.tobytes()


def _decode_payload(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    """Decode FakeRAW -> (samples uint8[frames,h,w], w, h, frames).

    Production: route to PIL / libsndfile / pyav here. This container
    has none of them, so non-FakeRAW payloads raise."""
    mv = memoryview(payload)
    if bytes(mv[:4]) != MAGIC:
        if not HAVE_PIL:
            raise NotImplementedError(
                "real image/audio decoding requires PIL/libsndfile "
                "(not in this container); payload is not FakeRAW")
        raise NotImplementedError("real decoder wiring: out of scope")
    w, h, frames, _ = struct.unpack_from("<HHHH", mv, 4)
    body = np.frombuffer(mv, dtype=np.uint8, offset=12,
                         count=w * h * frames)
    return body.reshape(frames, h, w), w, h, frames


def synthesize_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table (the fixture generator)."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for i in (int(x) for x in pdf["id"]):
                rng = np.random.default_rng([seed, i])
                modality = ["image", "audio", "video"][i % 3]
                if modality == "image":
                    w, h, frames, sr = int(rng.integers(8, 64)), int(rng.integers(8, 64)), 1, 0
                elif modality == "audio":
                    w, h, frames, sr = int(rng.integers(256, 4096)), 1, 1, 16000
                else:
                    w, h, frames, sr = 16, 16, int(rng.integers(4, 32)), 0
                rows.append({
                    "asset_id": f"{modality}-{i:08d}", "modality": modality,
                    "payload": _fake_payload(rng, modality, w, h, frames),
                    "width": w, "height": h, "n_frames": frames,
                    "sample_rate": sr,
                })
            yield pd.DataFrame(rows)

    parts = max(spark.sparkContext.defaultParallelism, 4)
    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, ASSET_SCHEMA_DDL)


# version suffix: regenerates automatically when the fixture schema or
# ground-truth definition changes (a stale cached file would otherwise
# short-circuit generation forever)
ASSET_FIXTURE_PATH = "/tmp/rle_spark_assets_v2.parquet"
ASSET_FIXTURE_N = 120


def _feature_truth(payload: bytes) -> tuple[int, str, float, float]:
    """Ground-truth features of one payload (same math the Spark UDF
    must reproduce through the Arrow/parquet plumbing)."""
    samples, _w, _h, _frames = _decode_payload(payload)
    flat = samples.reshape(-1)
    counts = np.bincount(flat, minlength=256)
    p = counts[counts > 0] / len(flat)
    return (len(payload), hashlib.md5(payload).hexdigest(),
            float(flat.mean()) if len(flat) else 0.0,
            float(-(p * np.log2(p)).sum()))


def ensure_asset_parquet(path: str = ASSET_FIXTURE_PATH,
                         n: int = ASSET_FIXTURE_N, seed: int = 42) -> str:
    """Deterministic asset fixture written with plain pyarrow (no
    Spark), carrying ground-truth feature columns (gt_*) computed at
    generation time. The oracle-checked multimodal query recomputes the
    features through the Spark mapInPandas path and must match — this
    puts the binary-column plumbing under the driver's DuckDB gate."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    if os.path.exists(path):
        return path
    rows: dict[str, list] = {k: [] for k in (
        "asset_id", "modality", "payload", "width", "height", "n_frames",
        "sample_rate", "gt_n_bytes", "gt_md5", "gt_mean", "gt_entropy")}
    for i in range(n):
        rng = np.random.default_rng([seed, i])
        modality = ["image", "audio", "video"][i % 3]
        if modality == "image":
            w, h, frames, sr = int(rng.integers(8, 64)), int(rng.integers(8, 64)), 1, 0
        elif modality == "audio":
            w, h, frames, sr = int(rng.integers(256, 4096)), 1, 1, 16000
        else:
            w, h, frames, sr = 16, 16, int(rng.integers(4, 32)), 0
        payload = _fake_payload(rng, modality, w, h, frames)
        n_bytes, md5, mean, ent = _feature_truth(payload)
        rows["asset_id"].append(f"{modality}-{i:08d}")
        rows["modality"].append(modality)
        rows["payload"].append(payload)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["n_frames"].append(frames)
        rows["sample_rate"].append(sr)
        # RAW doubles, no pre-rounding: the Spark query recomputes the
        # same numpy math bit-identically, so the gate compares exact
        # doubles (Python round is banker's, Spark ROUND is HALF_UP —
        # pre-rounding one side invites boundary flakes)
        rows["gt_n_bytes"].append(n_bytes)
        rows["gt_md5"].append(md5)
        rows["gt_mean"].append(mean)
        rows["gt_entropy"].append(ent)
    table = pa.table({
        "asset_id": pa.array(rows["asset_id"], pa.string()),
        "modality": pa.array(rows["modality"], pa.string()),
        "payload": pa.array(rows["payload"], pa.binary()),
        "width": pa.array(rows["width"], pa.int32()),
        "height": pa.array(rows["height"], pa.int32()),
        "n_frames": pa.array(rows["n_frames"], pa.int32()),
        "sample_rate": pa.array(rows["sample_rate"], pa.int32()),
        "gt_n_bytes": pa.array(rows["gt_n_bytes"], pa.int64()),
        "gt_md5": pa.array(rows["gt_md5"], pa.string()),
        "gt_mean": pa.array(rows["gt_mean"], pa.float64()),
        "gt_entropy": pa.array(rows["gt_entropy"], pa.float64()),
    })
    tmp = f"{path}.tmp{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)  # atomic against concurrent generators
    return path


def extract_features(assets: DataFrame) -> DataFrame:
    """Per-asset content features, vectorized per Arrow batch."""
    def it(batches):
        for pdf in batches:
            out = []
            for aid, mod, payload in zip(pdf["asset_id"], pdf["modality"],
                                         pdf["payload"]):
                samples, w, h, frames = _decode_payload(bytes(payload))
                flat = samples.reshape(-1)
                counts = np.bincount(flat, minlength=256)
                p = counts[counts > 0] / len(flat)
                out.append({
                    "asset_id": aid, "modality": mod,
                    "n_bytes": len(payload),
                    "content_md5": hashlib.md5(bytes(payload)).hexdigest(),
                    "mean_level": float(flat.mean()) if len(flat) else 0.0,
                    "byte_entropy": float(-(p * np.log2(p)).sum()),
                })
            yield pd.DataFrame(out)

    return assets.mapInPandas(it, FEATURE_SCHEMA_DDL)


def resize_images(assets: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Block-mean resize of image assets (real math on fake pixels)."""
    def it(batches):
        for pdf in batches:
            out = []
            for aid, mod, payload in zip(pdf["asset_id"], pdf["modality"],
                                         pdf["payload"]):
                if mod != "image":
                    continue
                samples, w, h, _ = _decode_payload(bytes(payload))
                img = samples[0].astype(np.float64)
                ys = np.linspace(0, h, out_h + 1).astype(int)
                xs = np.linspace(0, w, out_w + 1).astype(int)
                small = np.empty((out_h, out_w), dtype=np.uint8)
                for yi in range(out_h):  # out_h is a small constant
                    rows = img[ys[yi]:max(ys[yi + 1], ys[yi] + 1)]
                    csum = rows.mean(axis=0)
                    for xi in range(out_w):
                        seg = csum[xs[xi]:max(xs[xi + 1], xs[xi] + 1)]
                        small[yi, xi] = int(seg.mean())
                out.append({"asset_id": aid, "width": out_w, "height": out_h,
                            "payload": small.tobytes()})
            yield pd.DataFrame(out, columns=["asset_id", "width", "height",
                                             "payload"])

    return assets.mapInPandas(it, RESIZED_SCHEMA_DDL)


def frame_sample(assets: DataFrame, every_n: int = 4) -> DataFrame:
    """Every-nth-frame sampling of video assets."""
    def it(batches):
        for pdf in batches:
            out = []
            for aid, mod, payload in zip(pdf["asset_id"], pdf["modality"],
                                         pdf["payload"]):
                if mod != "video":
                    continue
                samples, w, h, frames = _decode_payload(bytes(payload))
                for fi in range(0, frames, every_n):
                    out.append({"asset_id": aid, "frame_index": fi,
                                "payload": samples[fi].tobytes()})
            yield pd.DataFrame(out, columns=["asset_id", "frame_index",
                                             "payload"])

    return assets.mapInPandas(it, FRAMES_SCHEMA_DDL)
