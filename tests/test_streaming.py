"""Structured Streaming ingest: incremental encode via foreachBatch
with the same mapInArrow kernel as the batch engine."""

import os

from pyspark.sql import functions as F

from rle_spark.datagen import token_table
from rle_spark.engine import (EngineConfig, decode_dataframe, read_encoded,
                              roundtrip_mismatch_count)
from rle_spark.streaming import encode_stream_backfill

CFG = EngineConfig(block_tokens=1 << 15, layout="mapside")


def test_stream_backfill_then_incremental(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("stream_src"))
    out = str(tmp_path_factory.mktemp("stream_out"))

    wave1 = token_table(spark, 80, seed=11).cache()
    wave1.count()
    wave1.write.mode("overwrite").parquet(src)

    s1 = encode_stream_backfill(spark, src, out, CFG)
    assert s1["n_docs"] == 80
    assert s1["ratio"] < 1.0
    decoded = decode_dataframe(read_encoded(spark, out))
    assert roundtrip_mismatch_count(wave1, decoded) == 0

    # second wave lands as NEW files; the checkpoint makes the next
    # drain pick up only those
    wave2 = (token_table(spark, 40, seed=12)
             .withColumn("doc_id", F.concat(F.lit("w2-"), F.col("doc_id"))))
    wave2 = wave2.cache()
    wave2.count()
    wave2.write.mode("append").parquet(src)

    s2 = encode_stream_backfill(spark, src, out, CFG)
    assert s2["n_docs"] == 120  # manifest covers both waves
    both = wave1.unionByName(wave2)
    decoded2 = decode_dataframe(read_encoded(spark, out))
    assert roundtrip_mismatch_count(both, decoded2) == 0
    assert os.path.exists(os.path.join(out, "_checkpoint"))
    wave1.unpersist()
    wave2.unpersist()
