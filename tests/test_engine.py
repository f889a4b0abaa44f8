"""Spark end-to-end: encode -> decode bit-identical, manifests, resume
(SURVEY.md §5 ported strategy items b & e)."""

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from rle_spark.datagen import token_table
from rle_spark.engine import (
    EngineConfig,
    decode_dataframe,
    encode_dataframe,
    encode_table,
    read_encoded,
    roundtrip_mismatch_count,
)

CFG = EngineConfig(block_tokens=1 << 15, target_bucket_tokens=1 << 19)


@pytest.fixture(scope="module")
def tokens_df(spark):
    df = token_table(spark, 200, seed=42).cache()
    df.count()
    yield df
    df.unpersist()


def test_encode_decode_bit_identical(spark, tokens_df):
    blocks = encode_dataframe(tokens_df, CFG).cache()
    try:
        assert blocks.count() > 0
        decoded = decode_dataframe(blocks)
        assert roundtrip_mismatch_count(tokens_df, decoded) == 0
    finally:
        blocks.unpersist()


def test_blocks_respect_partitioning(spark, tokens_df):
    blocks = encode_dataframe(tokens_df, CFG)
    rows = blocks.select("block_id", "source", "bucket", "n_tokens").collect()
    seen = set()
    for r in rows:
        assert r.block_id.startswith(f"{r.source}:{r.bucket:05d}:")
        assert r.block_id not in seen
        seen.add(r.block_id)


def test_ratio_below_raw(spark, tokens_df):
    blocks = encode_dataframe(tokens_df, CFG)
    agg = blocks.agg(F.sum("orig_bytes").alias("o"),
                     F.sum("comp_bytes").alias("c")).collect()[0]
    assert agg["c"] < agg["o"]  # corpus contains compressible sources


def test_incompressible_source_selects_raw(spark, tokens_df):
    blocks = encode_dataframe(tokens_df, CFG)
    codecs = {r["codec"] for r in
              blocks.filter(F.col("source") == "synth_rand")
              .select("codec").distinct().collect()}
    # random tokens over a 2^31 vocab: raw or near-raw bitpack only
    assert codecs <= {"raw", "for_bitpack"}


def test_encode_table_and_resume(spark, tokens_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("enc"))
    shutil.rmtree(out, ignore_errors=True)
    s1 = encode_table(spark, tokens_df, out, CFG)
    assert s1["skipped_partitions"] == 0
    assert s1["n_docs"] == 200
    assert 0 < s1["ratio"] <= 1.0
    manifest = spark.read.parquet(os.path.join(out, "manifest"))
    n_parts = manifest.count()
    assert n_parts > 0
    # resume over the same input: everything skipped, manifest unchanged
    s2 = encode_table(spark, tokens_df, out, CFG)
    assert s2["skipped_partitions"] == n_parts
    assert s2["comp_bytes"] == s1["comp_bytes"]
    assert s2["n_docs"] == s1["n_docs"]
    # decoded output still bit-identical after resume
    decoded = decode_dataframe(read_encoded(spark, out))
    assert roundtrip_mismatch_count(tokens_df, decoded) == 0


def test_resume_after_partial_manifest(spark, tokens_df, tmp_path_factory):
    """Kill-after-partial-commit: drop half the manifest rows, rerun,
    final state identical (SURVEY.md §5 item e)."""
    out = str(tmp_path_factory.mktemp("enc2"))
    s1 = encode_table(spark, tokens_df, out, CFG)
    manifest_path = os.path.join(out, "manifest")
    m = spark.read.parquet(manifest_path).collect()
    keep = m[: len(m) // 2]
    shutil.rmtree(manifest_path)
    if keep:
        spark.createDataFrame(keep).write.parquet(manifest_path)
        s2 = encode_table(spark, tokens_df, out, CFG)
        assert s2["skipped_partitions"] == len(keep)
    else:
        s2 = encode_table(spark, tokens_df, out, CFG)
    assert s2["comp_bytes"] == s1["comp_bytes"]
    decoded = decode_dataframe(read_encoded(spark, out))
    assert roundtrip_mismatch_count(tokens_df, decoded) == 0


def test_bucket_skew_bounded(spark, tokens_df):
    """Skew handling: no (source,bucket) partition should dwarf the
    target size by more than one max-doc overshoot."""
    from rle_spark.engine import plan_buckets
    b = plan_buckets(tokens_df, CFG)
    sizes = (b.groupBy("source", "bucket").agg(F.sum("n_tok").alias("t"))
             .collect())
    max_doc = tokens_df.agg(F.max("n_tok")).collect()[0][0]
    limit = CFG.target_bucket_tokens + max_doc
    for r in sizes:
        assert r["t"] <= limit * 2, (r["source"], r["bucket"], r["t"])


# ---------------------------------------------------------------------------
# mapside (zero-shuffle) layout
# ---------------------------------------------------------------------------

MAPSIDE_CFG = EngineConfig(block_tokens=1 << 15, layout="mapside")


def test_mapside_encode_decode_bit_identical(spark, tokens_df):
    blocks = encode_dataframe(tokens_df, MAPSIDE_CFG).cache()
    try:
        assert blocks.count() > 0
        decoded = decode_dataframe(blocks)
        assert roundtrip_mismatch_count(tokens_df, decoded) == 0
    finally:
        blocks.unpersist()


def test_mapside_matches_clustered_bytes(spark, tokens_df):
    """Same data, same codecs -> mapside and clustered compress within
    a few % of each other (block packing differs, content does not)."""
    a = (encode_dataframe(tokens_df, MAPSIDE_CFG)
         .agg(F.sum("comp_bytes")).collect()[0][0])
    b = (encode_dataframe(tokens_df, CFG)
         .agg(F.sum("comp_bytes")).collect()[0][0])
    assert abs(a - b) / b < 0.10


def test_mapside_block_ids_unique(spark, tokens_df):
    blocks = encode_dataframe(tokens_df, MAPSIDE_CFG)
    total = blocks.count()
    assert blocks.select("block_id").distinct().count() == total


def test_mapside_encode_table_and_decode(spark, tokens_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mapside_out"))
    shutil.rmtree(out, ignore_errors=True)
    s = encode_table(spark, tokens_df, out, MAPSIDE_CFG, resume=False)
    assert s["ratio"] < 1.0
    decoded = decode_dataframe(read_encoded(spark, out))
    assert roundtrip_mismatch_count(tokens_df, decoded) == 0
    # resume over a mapside manifest must refuse, not corrupt
    with pytest.raises(ValueError):
        encode_table(spark, tokens_df, out, MAPSIDE_CFG, resume=True)


@pytest.mark.parametrize("codec", ["rle128_byte", "mtf32_rle8", "fsst8",
                                   "zlib_raw", "rle16_sym", "delta_bitpack"])
def test_forced_codec_spark_roundtrip(spark, tokens_df, codec):
    """Every codec family must survive the FULL Spark path (framing,
    parquet, decode) — not only the ones the selector favors."""
    from rle_spark.selector import SelectorConfig
    cfg = EngineConfig(block_tokens=1 << 15, layout="mapside",
                       selector=SelectorConfig(effort="max",
                                               allow=[codec, "raw"]))
    small = tokens_df.limit(40)
    blocks = encode_dataframe(small, cfg).cache()
    try:
        used = {r["codec"] for r in blocks.select("codec").distinct().collect()}
        assert used <= {codec, "raw"}
        assert roundtrip_mismatch_count(small, decode_dataframe(blocks)) == 0
    finally:
        blocks.unpersist()
