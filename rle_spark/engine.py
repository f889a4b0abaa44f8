"""DataFrame encode/decode pipeline.

Spark-first equivalents of the reference's execution model
(SURVEY.md §3.2): the 1 GiB single buffer becomes a stream of bounded
blocks per partition; rle8m's independently-decodable subsections +
offset table (/root/reference/src/rle8_low_entropy_cpu.c:126-250)
become (source, bucket) parquet partitions + per-block doc offset
columns; SIMD dispatch becomes Arrow-vectorized NumPy inside
mapInPandas. Zero per-row Python anywhere.

Scale design (100 TB / 10^12 sequences):
  * two-pass plan: a cheap stats aggregation over (source, n_tok) —
    column-pruned at the parquet scan — sizes the bucket count per
    source so every shuffle partition lands near `target_bucket_tokens`
    regardless of source skew (books-like sources with 1000x longer
    docs get proportionally more buckets; the doc-hash spreads them).
  * exactly ONE shuffle (the repartition by source+bucket); encode,
    framing and manifest stats all ride map-side on top of it.
  * blocks are bounded (`block_tokens`), so executor memory needs are
    O(block) not O(partition); Arrow streams batches through the UDF.
  * resume: blocks land under parquet partitions source=/bucket=;
    dynamic partition overwrite makes re-running a failed job
    idempotent, and committed (source,bucket) pairs recorded in the
    manifest are skipped entirely (SURVEY.md §7.1 step 7).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from . import memtune

memtune.apply()  # must precede JVM launch (workers inherit driver env)

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import __version__
from .blocks import BLOCK_SCHEMA_DDL, DECODED_SCHEMA_DDL, decode_block, frame_payload, split_docs
from .selector import SelectorConfig, StickySelector


@dataclass
class EngineConfig:
    block_tokens: int = 1 << 18          # tokens per encoded block
    target_bucket_tokens: int = 8 << 20  # tokens per (source,bucket)
    min_buckets: int = 1
    selector: SelectorConfig = field(default_factory=SelectorConfig)
    parquet_codec: str = "zstd"


def get_spark(app: str = "rle_spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Local-mode session with the engine's recommended conf.

    On a real cluster the same conf applies minus `master`; the job is
    shipped via spark-submit --py-files (see rle_spark/jobs/encode.py).
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sp = shuffle_partitions or max(cpus, 8)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("RLE_SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def warm_python_workers(spark: SparkSession, cpus: int, mb: int = 128) -> None:
    """One dry pass that spawns a python worker per core and touches
    `mb` MiB of heap in each — the engine's analogue of the reference
    benchmark's untimed dry run (/root/reference/src/main.c:808-811),
    here also defeating this host's first-touch page-fault stalls
    (see memtune)."""
    from .memtune import warm_heap

    def it(batches):
        warm_heap(mb)
        yield from batches

    (spark.range(cpus * 2, numPartitions=cpus * 2)
     .mapInPandas(it, "id long").count())


# ---------------------------------------------------------------------------
# bucket planning (explicit skew handling)
# ---------------------------------------------------------------------------


def bucket_counts(df: DataFrame, cfg: EngineConfig) -> dict[str, int]:
    """Per-source bucket counts from token totals.

    The stats pass only touches (source, n_tok) — Catalyst prunes the
    token arrays out of the scan — so it is cheap even at 100 TB.
    """
    totals = (df.groupBy("source").agg(F.sum("n_tok").alias("total"))
              .collect())
    return {
        r["source"]: max(cfg.min_buckets,
                         int(np.ceil((r["total"] or 0) / cfg.target_bucket_tokens)))
        for r in totals
    }


def apply_buckets(df: DataFrame, buckets: dict[str, int]) -> DataFrame:
    """Add the `bucket` column. The per-source bucket counts are a tiny
    driver-side map compiled into the plan (a literal-map lookup — no
    join, no broadcast needed)."""
    if not buckets:  # empty input: single bucket, no map lookup
        return df.withColumn("bucket", F.lit(0))
    mapping = F.create_map(*[F.lit(x) for kv in buckets.items() for x in kv])
    n_buckets = mapping[F.col("source")]
    return df.withColumn(
        "bucket",
        F.pmod(F.xxhash64(F.col("doc_id")), n_buckets).cast("int"),
    )


def plan_buckets(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    return apply_buckets(df, bucket_counts(df, cfg))


def _arrange(bucketed: DataFrame, buckets: dict[str, int]) -> DataFrame:
    """One explicit shuffle sized to the bucket count.

    The partition count is pinned to the number of (source,bucket)
    pairs so encode parallelism tracks the data volume — AQE would
    otherwise coalesce the small-looking shuffle into a handful of
    tasks and serialize the (CPU-heavy) encode stage behind it.
    """
    n_parts = max(sum(buckets.values()), 1)
    return (bucketed
            .repartition(n_parts, "source", "bucket")
            .sortWithinPartitions("source", "bucket", "doc_id"))


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _block_id(source: str, bucket: int, seq: int) -> str:
    return f"{source}:{bucket:05d}:{seq:06d}"


def _encode_iter_factory(cfg: EngineConfig):
    block_tokens = cfg.block_tokens
    sel_cfg = cfg.selector

    def encode_iter(batches):
        # per-partition streaming state: rows arrive sorted by
        # (source, bucket, doc_id) thanks to sortWithinPartitions.
        # All slicing below is over vectorized group/block boundaries —
        # Python loops run per GROUP and per BLOCK, never per row.
        state = {"key": None, "docs": [], "ids": [], "ntok": 0, "seq": {}}
        sticky = StickySelector(sel_cfg)

        def flush():
            if not state["ids"]:
                return None
            source, bucket = state["key"]
            seq = state["seq"].get(state["key"], 0)
            state["seq"][state["key"]] = seq + 1
            doc_lens = np.fromiter((len(t) for t in state["docs"]),
                                   dtype=np.int64, count=len(state["docs"]))
            tokens = (np.concatenate(state["docs"]).astype(np.int32, copy=False)
                      if state["docs"] else np.zeros(0, dtype=np.int32))
            name, payload = sticky.encode(state["key"], tokens)
            framed = frame_payload(name, len(tokens), payload)
            row = pd.DataFrame({
                "block_id": [_block_id(source, bucket, seq)],
                "source": [source],
                "bucket": [bucket],
                "seq": [seq],
                "n_docs": [len(doc_lens)],
                "n_tokens": [int(len(tokens))],
                "doc_ids": [list(state["ids"])],
                "doc_lens": [doc_lens.astype(np.int32).tolist()],
                "codec": [name],
                "orig_bytes": [int(4 * len(tokens))],
                "comp_bytes": [int(len(framed))],
                "payload": [framed],
            })
            state["docs"], state["ids"], state["ntok"] = [], [], 0
            return row

        for pdf in batches:
            out = []
            n = len(pdf)
            if n == 0:
                continue
            sources = pdf["source"].to_numpy()
            bucks = pdf["bucket"].to_numpy(dtype=np.int64)
            ids = pdf["doc_id"].to_numpy()
            toks = pdf["tokens"].to_numpy()
            ntoks = pdf["n_tok"].to_numpy(dtype=np.int64)
            # group boundaries within the batch (usually 0 or few)
            chg = np.flatnonzero(
                (sources[1:] != sources[:-1]) | (bucks[1:] != bucks[:-1])) + 1
            bounds = np.concatenate(([0], chg, [n]))
            for g0, g1 in zip(bounds[:-1], bounds[1:]):
                key = (sources[g0], int(bucks[g0]))
                if key != state["key"]:
                    r = flush()
                    if r is not None:
                        out.append(r)
                    state["key"] = key
                # block cut points via cumulative token counts
                cum = np.cumsum(ntoks[g0:g1]) + state["ntok"]
                cuts = [g0]
                target = block_tokens
                while True:
                    nxt = int(np.searchsorted(cum, target)) + 1
                    if nxt >= g1 - g0:
                        break
                    cuts.append(g0 + nxt)
                    target = cum[nxt - 1] + block_tokens
                cuts.append(g1)
                for c0, c1 in zip(cuts[:-1], cuts[1:]):
                    state["ids"].extend(ids[c0:c1].tolist())
                    state["docs"].extend(toks[c0:c1].tolist())
                    state["ntok"] = int(cum[c1 - g0 - 1]
                                        - (cum[c0 - g0 - 1] if c0 > g0 else 0))
                    if c1 != g1 or state["ntok"] >= block_tokens:
                        r = flush()
                        if r is not None:
                            out.append(r)
            if out:
                yield pd.concat(out, ignore_index=True)
        r = flush()
        if r is not None:
            yield r

    return encode_iter


def encode_dataframe(df: DataFrame, cfg: EngineConfig | None = None) -> DataFrame:
    """token table (doc_id, tokens, n_tok, source) -> encoded block rows.

    Lazy: returns the block DataFrame; one shuffle (source, bucket).
    """
    cfg = cfg or EngineConfig()
    buckets = bucket_counts(df, cfg)
    arranged = _arrange(apply_buckets(df, buckets), buckets)
    return arranged.mapInPandas(_encode_iter_factory(cfg), BLOCK_SCHEMA_DDL)


def encode_table(spark: SparkSession, df: DataFrame, out_dir: str,
                 cfg: EngineConfig | None = None, resume: bool = True) -> dict:
    """Full encode job: blocks + manifest on disk, idempotent resume.

    Returns a summary dict (ratio, bytes, skipped partitions).
    """
    cfg = cfg or EngineConfig()
    blocks_path = os.path.join(out_dir, "blocks")
    manifest_path = os.path.join(out_dir, "manifest")

    done = None
    skipped = 0
    if resume and os.path.exists(manifest_path):
        done = spark.read.parquet(manifest_path).select("source", "bucket")
        skipped = done.count()

    buckets = bucket_counts(df, cfg)
    bucketed = apply_buckets(df, buckets)
    if done is not None and skipped:
        bucketed = bucketed.join(F.broadcast(done), ["source", "bucket"],
                                 "left_anti")

    arranged = _arrange(bucketed, buckets)
    blocks = arranged.mapInPandas(_encode_iter_factory(cfg), BLOCK_SCHEMA_DDL)

    (blocks.write.mode("overwrite")
     .option("compression", cfg.parquet_codec)
     .partitionBy("source", "bucket")
     .parquet(blocks_path))

    # manifest from the committed files (ground truth, not the lazy plan)
    on_disk = spark.read.schema(BLOCK_SCHEMA_DDL).parquet(blocks_path)
    per_codec = (on_disk.groupBy("source", "bucket", "codec")
                 .agg(F.count("*").alias("n_blocks"),
                      F.sum("n_docs").alias("n_docs"),
                      F.sum("n_tokens").alias("n_tokens"),
                      F.sum("orig_bytes").alias("orig_bytes"),
                      F.sum("comp_bytes").alias("comp_bytes")))
    manifest = (per_codec.groupBy("source", "bucket")
                .agg(F.sum("n_blocks").alias("n_blocks"),
                     F.sum("n_docs").alias("n_docs"),
                     F.sum("n_tokens").alias("n_tokens"),
                     F.sum("orig_bytes").alias("orig_bytes"),
                     F.sum("comp_bytes").alias("comp_bytes"),
                     F.map_from_entries(F.collect_list(F.struct(
                         F.col("codec"), F.col("n_blocks")))).alias("codecs"),
                     F.lit(__version__).alias("engine_version")))
    manifest.write.mode("overwrite").parquet(manifest_path)

    summary_row = (spark.read.parquet(manifest_path)
                   .agg(F.sum("orig_bytes").alias("orig"),
                        F.sum("comp_bytes").alias("comp"),
                        F.sum("n_tokens").alias("n_tokens"),
                        F.sum("n_docs").alias("n_docs"))
                   .collect()[0])
    orig = summary_row["orig"] or 0
    comp = summary_row["comp"] or 0
    return {
        "orig_bytes": int(orig),
        "comp_bytes": int(comp),
        "ratio": (comp / orig) if orig else 1.0,
        "n_tokens": int(summary_row["n_tokens"] or 0),
        "n_docs": int(summary_row["n_docs"] or 0),
        "skipped_partitions": int(skipped),
    }


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _decode_iter(batches):
    for pdf in batches:
        out_ids: list = []
        out_tokens: list = []
        for payload, doc_ids, doc_lens in zip(
                pdf["payload"], pdf["doc_ids"], pdf["doc_lens"]):
            tokens = decode_block(bytes(payload))
            lens = np.asarray(doc_lens, dtype=np.int64)
            out_ids.extend(list(doc_ids))
            out_tokens.extend(t for t in split_docs(tokens, lens))
        yield pd.DataFrame({
            "doc_id": out_ids,
            "tokens": [t.astype(np.int32) for t in out_tokens],
        })


def decode_dataframe(blocks: DataFrame) -> DataFrame:
    """Encoded block rows -> (doc_id, tokens) rows."""
    cols = blocks.select("payload", "doc_ids", "doc_lens")
    return cols.mapInPandas(_decode_iter, DECODED_SCHEMA_DDL)


def read_encoded(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "blocks"))


def roundtrip_mismatch_count(original: DataFrame, decoded: DataFrame) -> int:
    """Number of docs whose decoded token array differs (0 == bit-identical)."""
    joined = (original.select("doc_id", F.col("tokens").alias("t0"))
              .join(decoded.select("doc_id", F.col("tokens").alias("t1")),
                    "doc_id", "full_outer"))
    bad = joined.filter(
        F.col("t0").isNull() | F.col("t1").isNull() |
        (F.col("t0") != F.col("t1")))
    return bad.count()
