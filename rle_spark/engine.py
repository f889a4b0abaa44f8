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

from . import memtune

memtune.apply()  # must precede JVM launch (workers inherit driver env)

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import __version__
from .blocks import BLOCK_SCHEMA_DDL, DECODED_SCHEMA_DDL, decode_block, frame_payload
from .selector import SelectorConfig, StickySelector


@dataclass
class EngineConfig:
    block_tokens: int = 1 << 18          # tokens per encoded block
    target_bucket_tokens: int = 8 << 20  # tokens per (source,bucket)
    min_buckets: int = 1
    selector: SelectorConfig = field(default_factory=SelectorConfig)
    parquet_codec: str = "zstd"
    # layout = how blocks are grouped on disk:
    #   "clustered": one explicit shuffle to (source, bucket) partitions —
    #     re-clusters arbitrary input, manifest-level resume skips
    #     committed buckets (the north-star repartition+salt path).
    #   "mapside": ZERO shuffle — encode rides the scan partitions
    #     (bucket = task partition id). The at-scale default when the
    #     table is already source-clustered (Iceberg write layout):
    #     no 2x network+spill of the token payload, parallelism =
    #     split count, skew bounded by spark.sql.files.maxPartitionBytes
    #     rather than by key salting.
    layout: str = "clustered"


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


# Arrow schema mirror of BLOCK_SCHEMA_DDL (mapInArrow needs pa types)
def _block_arrow_schema():
    import pyarrow as pa
    return pa.schema([
        ("block_id", pa.string()),
        ("source", pa.string()),
        ("bucket", pa.int32()),
        ("seq", pa.int32()),
        ("n_docs", pa.int32()),
        ("n_tokens", pa.int64()),
        ("doc_ids", pa.list_(pa.string())),
        ("doc_lens", pa.list_(pa.int32())),
        ("codec", pa.string()),
        ("orig_bytes", pa.int64()),
        ("comp_bytes", pa.int64()),
        ("payload", pa.binary()),
    ])


# keep a yielded output batch's payload bytes below this (binary
# columns carry int32 offsets -> 2 GiB ceiling per Arrow array)
_OUT_FLUSH_BYTES = 512 << 20


def _encode_iter_factory(cfg: EngineConfig, mapside: bool = False):
    """mapInArrow kernel: Arrow RecordBatch in -> block RecordBatch out.

    The token column is consumed through the ListArray's FLAT values
    buffer (`offsets` + `values`) — the per-doc arrays are never
    materialized as Python objects, so the only O(data) work between
    the parquet scan and the codec kernel is one contiguous int32
    slice per block. This is the Spark/Arrow analogue of the
    reference operating on a single `uint8_t*` buffer
    (/root/reference/src/rle.h:100-105): the Arrow value buffer IS
    that buffer. Python loops run per GROUP and per BLOCK, never per
    row/doc.

    One open block is kept per (source, bucket) key, so input does
    NOT need to be sorted by key — clustered mode feeds whole-key
    partitions, mapside mode feeds raw scan splits with interleaved
    sources; both stream through the same state machine with
    O(n_keys * block_tokens) memory.
    """
    import pyarrow as pa

    block_tokens = cfg.block_tokens
    sel_cfg = cfg.selector
    out_schema = _block_arrow_schema()

    def encode_iter(batches):
        sticky = StickySelector(sel_cfg)
        seqs: dict = {}
        if mapside:
            from pyspark import TaskContext
            tc = TaskContext.get()
            pid = tc.partitionId() if tc is not None else 0
        # open blocks carried across batch boundaries, one per key:
        # fragments of the flat token buffer + parallel id/len fragments
        open_blocks: dict = {}

        def _fresh():
            return {"toks": [], "ids": [], "lens": [], "ntok": 0,
                    "ndocs": 0}
        # completed-block accumulators (scalars + fragments per block)
        out: dict = {k: [] for k in ("block_id", "source", "bucket", "seq",
                                     "n_docs", "n_tokens", "codec",
                                     "orig_bytes", "comp_bytes", "payload")}
        out_ids: list = []    # one (list of pa.Array fragments) per block
        out_lens: list = []   # one np.int32 array per block
        out_bytes = 0

        def flush_block(key):
            nonlocal out_bytes
            cur = open_blocks.get(key)
            if cur is None or not cur["ndocs"]:
                return
            source, bucket = key
            seq = seqs.get(key, 0)
            seqs[key] = seq + 1
            tokens = (cur["toks"][0] if len(cur["toks"]) == 1
                      else np.concatenate(cur["toks"])
                      if cur["toks"] else np.zeros(0, np.int32))
            name, payload = sticky.encode(key, tokens)
            framed = frame_payload(name, len(tokens), payload)
            out["block_id"].append(_block_id(source, bucket, seq))
            out["source"].append(source)
            out["bucket"].append(bucket)
            out["seq"].append(seq)
            out["n_docs"].append(cur["ndocs"])
            out["n_tokens"].append(len(tokens))
            out["codec"].append(name)
            out["orig_bytes"].append(4 * len(tokens))
            out["comp_bytes"].append(len(framed))
            out["payload"].append(framed)
            out_ids.append(cur["ids"])
            out_lens.append(np.concatenate(cur["lens"]) if cur["lens"]
                            else np.zeros(0, np.int32))
            out_bytes += len(framed)
            cur.update(toks=[], ids=[], lens=[], ntok=0, ndocs=0)

        def emit_batch():
            nonlocal out_bytes
            if not out["block_id"]:
                return None
            id_counts = np.fromiter(
                (sum(len(f) for f in frags) for frags in out_ids),
                dtype=np.int64, count=len(out_ids))
            id_offsets = np.concatenate(([0], np.cumsum(id_counts)))
            id_values = pa.concat_arrays(
                [f for frags in out_ids for f in frags] or
                [pa.array([], pa.string())])
            len_counts = np.fromiter((len(a) for a in out_lens),
                                     dtype=np.int64, count=len(out_lens))
            len_offsets = np.concatenate(([0], np.cumsum(len_counts)))
            len_values = (np.concatenate(out_lens) if out_lens
                          else np.zeros(0, np.int32))
            batch = pa.record_batch([
                pa.array(out["block_id"], pa.string()),
                pa.array(out["source"], pa.string()),
                pa.array(out["bucket"], pa.int32()),
                pa.array(out["seq"], pa.int32()),
                pa.array(out["n_docs"], pa.int32()),
                pa.array(out["n_tokens"], pa.int64()),
                pa.ListArray.from_arrays(
                    pa.array(id_offsets, pa.int32()), id_values),
                pa.ListArray.from_arrays(
                    pa.array(len_offsets, pa.int32()),
                    pa.array(len_values.astype(np.int32, copy=False))),
                pa.array(out["codec"], pa.string()),
                pa.array(out["orig_bytes"], pa.int64()),
                pa.array(out["comp_bytes"], pa.int64()),
                pa.array(out["payload"], pa.binary()),
            ], schema=out_schema)
            for v in out.values():
                v.clear()
            out_ids.clear()
            out_lens.clear()
            out_bytes = 0
            return batch

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            sources = rb.column("source").to_numpy(zero_copy_only=False)
            if mapside:
                bucks = np.full(n, pid, dtype=np.int64)
            else:
                bucks = rb.column("bucket").to_numpy(zero_copy_only=False)
            ids_arr = rb.column("doc_id")
            tok_col = rb.column("tokens")
            offs = tok_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            flat = tok_col.values.to_numpy(zero_copy_only=False)
            if flat.dtype != np.int32:
                flat = flat.astype(np.int32)
            doc_lens = np.diff(offs).astype(np.int32)
            # group boundaries within the batch (usually 0 or few)
            chg = np.flatnonzero(
                (sources[1:] != sources[:-1]) | (bucks[1:] != bucks[:-1])) + 1
            bounds = np.concatenate(([0], chg, [n]))
            for g0, g1 in zip(bounds[:-1], bounds[1:]):
                key = (sources[g0], int(bucks[g0]))
                cur = open_blocks.get(key)
                if cur is None:
                    cur = open_blocks[key] = _fresh()
                # block cut points via cumulative token counts
                cum = np.cumsum(doc_lens[g0:g1], dtype=np.int64) + cur["ntok"]
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
                    cur["toks"].append(flat[offs[c0]:offs[c1]])
                    cur["ids"].append(ids_arr.slice(c0, c1 - c0))
                    cur["lens"].append(doc_lens[c0:c1])
                    cur["ndocs"] += c1 - c0
                    cur["ntok"] = int(cum[c1 - g0 - 1]
                                      - (cum[c0 - g0 - 1] if c0 > g0 else 0))
                    if c1 != g1 or cur["ntok"] >= block_tokens:
                        flush_block(key)
                        # check INSIDE the cut loop too: a single huge
                        # input batch (very long docs) must not pile up
                        # payloads past the int32 Arrow-offset ceiling
                        # before the between-batches check runs
                        if out_bytes >= _OUT_FLUSH_BYTES:
                            b = emit_batch()
                            if b is not None:
                                yield b
            if out_bytes >= _OUT_FLUSH_BYTES:
                b = emit_batch()
                if b is not None:
                    yield b
        for key in list(open_blocks):
            flush_block(key)
        b = emit_batch()
        if b is not None:
            yield b

    return encode_iter


def encode_dataframe(df: DataFrame, cfg: EngineConfig | None = None) -> DataFrame:
    """token table (doc_id, tokens, n_tok, source) -> encoded block rows.

    Lazy: returns the block DataFrame; one shuffle (source, bucket).
    """
    cfg = cfg or EngineConfig()
    if cfg.layout == "mapside":
        return df.mapInArrow(_encode_iter_factory(cfg, mapside=True),
                             BLOCK_SCHEMA_DDL)
    buckets = bucket_counts(df, cfg)
    arranged = _arrange(apply_buckets(df, buckets), buckets)
    return arranged.mapInArrow(_encode_iter_factory(cfg), BLOCK_SCHEMA_DDL)


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
        if cfg.layout == "mapside":
            raise ValueError(
                "resume over an existing manifest requires layout='clustered'"
                " (mapside bucket ids are scan-split ordinals, not stable"
                " keys to anti-join on)")
        done = spark.read.parquet(manifest_path).select("source", "bucket")
        skipped = done.count()

    if cfg.layout == "mapside":
        blocks = df.mapInArrow(_encode_iter_factory(cfg, mapside=True),
                               BLOCK_SCHEMA_DDL)
    else:
        buckets = bucket_counts(df, cfg)
        bucketed = apply_buckets(df, buckets)
        if done is not None and skipped:
            bucketed = bucketed.join(F.broadcast(done), ["source", "bucket"],
                                     "left_anti")
        arranged = _arrange(bucketed, buckets)
        blocks = arranged.mapInArrow(_encode_iter_factory(cfg),
                                     BLOCK_SCHEMA_DDL)

    writer = (blocks.write.mode("overwrite")
              .option("compression", cfg.parquet_codec))
    if cfg.layout != "mapside":
        # clustered layout: physical source=/bucket= dirs give partition
        # pruning + per-bucket idempotent overwrite (resume). mapside
        # writes one file per scan split instead — the per-directory
        # commit cost is serial at the driver and would dominate with
        # thousands of (source, split) pairs; row-group stats on the
        # source/bucket columns still prune reads.
        writer = writer.partitionBy("source", "bucket")
    writer.parquet(blocks_path)

    refresh_manifest(spark, out_dir)

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


def refresh_manifest(spark: SparkSession, out_dir: str) -> None:
    """(Re)build <out_dir>/manifest from the committed block files —
    ground truth, not the lazy plan; also the recovery path after a
    partially-failed or streaming-appended write."""
    blocks_path = os.path.join(out_dir, "blocks")
    manifest_path = os.path.join(out_dir, "manifest")
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


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _decode_iter(batches):
    """mapInArrow inverse: block rows -> (doc_id, tokens) rows.

    One codec-kernel call per BLOCK; the per-doc re-slicing is pure
    offset arithmetic on the flat decoded buffer (a single
    ListArray.from_arrays call) — zero per-doc Python, mirroring the
    encoder.
    """
    import pyarrow as pa

    for rb in batches:
        if rb.num_rows == 0:
            continue
        payloads = rb.column("payload")
        ids_col = rb.column("doc_ids")
        lens_col = rb.column("doc_lens")
        # chunk the output so one yielded batch stays < ~2^31 values
        row0 = 0
        n = rb.num_rows
        while row0 < n:
            row1, tok_budget = row0, 256 << 20  # 256M tokens/out batch
            flats = []
            while row1 < n:
                # as_buffer: zero-copy view of the Arrow payload slab
                t = decode_block(payloads[row1].as_buffer())
                flats.append(t)
                tok_budget -= len(t)
                row1 += 1
                if tok_budget <= 0:
                    break
            flat = (flats[0] if len(flats) == 1
                    else np.concatenate(flats)
                    if flats else np.zeros(0, np.int32))
            lens_slice = lens_col.slice(row0, row1 - row0)
            doc_lens = lens_slice.flatten().to_numpy(zero_copy_only=False)
            offsets = np.concatenate(
                ([0], np.cumsum(doc_lens, dtype=np.int64)))
            ids_slice = ids_col.slice(row0, row1 - row0)
            id_values = ids_slice.flatten()
            tokens_list = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.array(flat.astype(np.int32, copy=False)))
            yield pa.record_batch(
                [id_values, tokens_list], names=["doc_id", "tokens"])
            row0 = row1


def decode_dataframe(blocks: DataFrame) -> DataFrame:
    """Encoded block rows -> (doc_id, tokens) rows."""
    cols = blocks.select("payload", "doc_ids", "doc_lens")
    return cols.mapInArrow(_decode_iter, DECODED_SCHEMA_DDL)


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
