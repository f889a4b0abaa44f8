"""Named queries over the driver's test tables — each paired with a
DuckDB oracle in __spark_entry__.py.

Every callable takes (spark, sf_dir) and returns a DataFrame whose
column names/types match the oracle SQL exactly (the driver hash-
compares values after sorting columns by name)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import analyze, similarity, textops
from .engine import EngineConfig, encode_dataframe, decode_dataframe

LINE_ORDER = ["l_orderkey", "l_linenumber"]
STAT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _ts(spark: SparkSession, sf_dir: str, name: str) -> "analyze.ParquetSource":
    """ParquetSource handle for the analyze family: enables the
    shuffle-free arranged fast path (provably-sorted row groups read
    task-side) plus session memoization of the O(C) stats rows."""
    return analyze.ParquetSource(
        spark, os.path.join(sf_dir, f"{name}.parquet"))


# --- codec/engine family ---------------------------------------------------


def q_run_stats_returnflag(spark, sf_dir):
    return analyze.run_stats(_ts(spark, sf_dir, "lineitem"),
                             "l_returnflag", LINE_ORDER)


def q_run_extract_orderstatus(spark, sf_dir):
    # run_extract returns the lazy run table, which must stay pinned
    # until consumed (analyze._PERSIST_POOL). Releasing only PREVIOUS
    # run_extract pins (scoped by owner tag, round-3 advice) caps the
    # pool at one table across bench re-runs without ever touching an
    # unrelated query's still-unconsumed intermediate.
    analyze.release_pins("run_extract")
    with analyze._pool_owner("run_extract"):
        return analyze.run_extract(_ts(spark, sf_dir, "orders"),
                                   "o_orderstatus", ["o_orderkey"])


def q_ref_rle8_size(spark, sf_dir):
    return analyze.ref_rle8_size_v1(_ts(spark, sf_dir, "lineitem"),
                                    ["l_returnflag", "l_linestatus"],
                                    LINE_ORDER)


def q_run_length_histogram(spark, sf_dir):
    return analyze.run_length_histogram(_ts(spark, sf_dir, "lineitem"),
                                        "l_returnflag", LINE_ORDER)


def q_column_codec_stats(spark, sf_dir):
    return (analyze.column_codec_stats(_ts(spark, sf_dir, "lineitem"),
                                       STAT_COLS, LINE_ORDER)
            .orderBy("col_name"))


def q_width2_run_histogram(spark, sf_dir):
    return analyze.sym_width_run_histogram(_ts(spark, sf_dir, "lineitem"),
                                           "l_returnflag", LINE_ORDER, 2)


def q_unaligned2_run_histogram(spark, sf_dir):
    return analyze.unaligned_run_histogram(_ts(spark, sf_dir, "lineitem"),
                                           "l_returnflag", LINE_ORDER, 2)


def q_width3_run_histogram(spark, sf_dir):
    """Non-power-of-two width: symbol boundaries do NOT divide byte
    groups evenly, so the alignment math (partial trailing symbol,
    per-task phase offsets) differs from every 2^k width — the
    reference sweeps 16 widths incl. 3/5/6/7 (src/main.c:1246-2257)."""
    return analyze.sym_width_run_histogram(_ts(spark, sf_dir, "lineitem"),
                                           "l_returnflag", LINE_ORDER, 3)


def q_unaligned3_run_histogram(spark, sf_dir):
    return analyze.unaligned_run_histogram(_ts(spark, sf_dir, "lineitem"),
                                           "l_returnflag", LINE_ORDER, 3)


def q_width6_run_histogram(spark, sf_dir):
    """Second non-power-of-two width (6 = 2*3, composite): the
    trailing-partial-symbol and per-task phase-offset math must hold
    where neither 2 nor 3 alone proves it — the reference's sweep
    covers 6 explicitly (src/main.c:1246-2257)."""
    return analyze.sym_width_run_histogram(_ts(spark, sf_dir, "lineitem"),
                                           "l_returnflag", LINE_ORDER, 6)


def q_unaligned6_run_histogram(spark, sf_dir):
    return analyze.unaligned_run_histogram(_ts(spark, sf_dir, "lineitem"),
                                           "l_returnflag", LINE_ORDER, 6)


def q_exact_run_histogram(spark, sf_dir):
    return analyze.exact_run_length_histogram(
        _ts(spark, sf_dir, "lineitem"), "l_returnflag", LINE_ORDER)


def q_width4_run_histogram(spark, sf_dir):
    return analyze.sym_width_run_histogram(_ts(spark, sf_dir, "lineitem"),
                                           "l_returnflag", LINE_ORDER, 4)


def q_unaligned4_run_histogram(spark, sf_dir):
    return analyze.unaligned_run_histogram(_ts(spark, sf_dir, "lineitem"),
                                           "l_returnflag", LINE_ORDER, 4)


def q_width8_run_histogram(spark, sf_dir):
    return analyze.sym_width_run_histogram(_ts(spark, sf_dir, "lineitem"),
                                           "l_returnflag", LINE_ORDER, 8)


def q_unaligned8_run_histogram(spark, sf_dir):
    return analyze.unaligned_run_histogram(_ts(spark, sf_dir, "lineitem"),
                                           "l_returnflag", LINE_ORDER, 8)


def q_width16_run_histogram(spark, sf_dir):
    return analyze.sym_width_run_histogram(_ts(spark, sf_dir, "lineitem"),
                                           "l_returnflag", LINE_ORDER, 16)


def q_unaligned16_run_histogram(spark, sf_dir):
    return analyze.unaligned_run_histogram(_ts(spark, sf_dir, "lineitem"),
                                           "l_returnflag", LINE_ORDER, 16)


def q_lru_recurrence(spark, sf_dir):
    return (analyze.lru_recurrence(_ts(spark, sf_dir, "orders"),
                                   "o_orderstatus", ["o_orderkey"])
            .orderBy("k"))


def q_codec_selection(spark, sf_dir):
    stats = analyze.column_codec_stats(_ts(spark, sf_dir, "lineitem"),
                                       STAT_COLS, LINE_ORDER)
    return analyze.codec_selection(stats)


def q_tokenize_stats(spark, sf_dir):
    toks = textops.tokenize_documents(_t(spark, sf_dir, "documents"))
    token_sum = F.aggregate("tokens", F.lit(0).cast("long"),
                            lambda acc, t: acc + t)
    return (toks.select("source", "n_tok", token_sum.alias("tsum"))
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tok").alias("total_tokens"),
                 F.sum("tsum").alias("token_id_sum"))
            .orderBy("source"))


def q_token_runs_by_source(spark, sf_dir):
    toks = textops.tokenize_documents(_t(spark, sf_dir, "documents"))
    head = F.expr("slice(tokens, 1, n_tok - 1)")
    tail = F.expr("slice(tokens, 2, n_tok - 1)")
    adj = F.when(F.col("n_tok") < 2, F.lit(0)).otherwise(
        F.size(F.filter(F.zip_with(head, tail, lambda a, b: a == b),
                        lambda x: x)))
    return (toks.select("source", adj.alias("adj"))
            .groupBy("source")
            .agg(F.sum("adj").cast("long").alias("adjacent_equal_pairs"))
            .orderBy("source"))


# --- dedup family ------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    return (textops.exact_dup_groups(_t(spark, sf_dir, "documents"))
            .orderBy("text_hash"))


def q_minhash_signatures(spark, sf_dir):
    return (textops.minhash_signatures(_t(spark, sf_dir, "documents"))
            .orderBy("doc_id"))


def q_near_dup_buckets(spark, sf_dir):
    return (textops.near_dup_buckets(_t(spark, sf_dir, "documents"))
            .orderBy("band", "band_hash"))


def q_simhash(spark, sf_dir):
    return textops.simhash64(_t(spark, sf_dir, "documents")).orderBy("doc_id")


def q_ngram_jaccard_pairs(spark, sf_dir):
    return (textops.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"))
            .orderBy("doc_a", "doc_b"))


def q_doc_fingerprint(spark, sf_dir):
    return (textops.doc_fingerprint(_t(spark, sf_dir, "documents"))
            .orderBy("doc_id"))


def q_cosine_near_dup(spark, sf_dir):
    """DEFAULT shape (round 4): n_planes auto-derived from the corpus
    (target bucket 256, floor NEAR_DUP_PLANES) — the scale-safe path a
    user gets without tuning. At the sf0.01 oracle corpus (500 vectors)
    the auto grid resolves to the same 6 planes as the old pinned
    default, so the frozen oracle stays byte-identical."""
    return (similarity.cosine_near_dup(_t(spark, sf_dir, "embeddings"))
            .orderBy("vec_a", "vec_b"))


def q_cosine_near_dup_pinned(spark, sf_dir):
    """Fixed-grid regression shape: explicit n_planes=NEAR_DUP_PLANES."""
    return (similarity.cosine_near_dup(_t(spark, sf_dir, "embeddings"),
                                       n_planes=similarity.NEAR_DUP_PLANES)
            .orderBy("vec_a", "vec_b"))


# aggressive auto-grid shape so the plane count provably varies with
# corpus size at test scale: target 16/bucket, floor 4 planes ->
# 5 planes at 500 vectors (not the fixed NEAR_DUP_PLANES=6), 7 at 2000
AUTO_ND_TARGET_BUCKET = 16
AUTO_ND_MIN_PLANES = 4


def q_cosine_near_dup_auto(spark, sf_dir):
    """cosine_near_dup with the corpus-sized plane grid (n_planes=None
    -> auto_n_planes): the at-scale shape where candidate volume stays
    ~N * target_bucket instead of drifting toward all-pairs. The oracle
    freezes the same plane count from the training corpus row count."""
    return (similarity.cosine_near_dup(
        _t(spark, sf_dir, "embeddings"), n_planes=None,
        auto_target_bucket=AUTO_ND_TARGET_BUCKET,
        auto_min_planes=AUTO_ND_MIN_PLANES)
        .orderBy("vec_a", "vec_b"))


# --- text analysis -----------------------------------------------------


def q_quality_by_source(spark, sf_dir):
    return (textops.token_count_stats(_t(spark, sf_dir, "documents"))
            .orderBy("source"))


def q_langid_counts(spark, sf_dir):
    lid = textops.langid_heuristic(_t(spark, sf_dir, "documents"))
    return (lid.groupBy("lang_pred").agg(F.count("*").alias("n_docs"))
            .orderBy("lang_pred"))


# --- similarity ---------------------------------------------------------


def q_embedding_quantize(spark, sf_dir):
    return (similarity.quantize_summary(_t(spark, sf_dir, "embeddings"))
            .orderBy("vec_id"))


def q_ann_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    top = similarity.cosine_topk(emb, [float(x) for x in qv], k=10)
    return top.select("vec_id",
                      F.round(F.col("cosine_sim"), 3).alias("sim_r3"))


# --- general engine sanity (classic OLAP shapes) -------------------------


def q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # decimal-before-sum: exact decimal arithmetic on both engines so the
    # oracle hash can never drift on float summation order
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    # final cast to double: the sums stay decimal-exact, but both engines
    # hand the driver the same float64 rendering (DuckDB's client
    # converts DECIMAL results to float64, so a Decimal here would
    # stringify differently despite equal values)
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(qty).cast("decimal(18,2)").cast("double").alias("sum_qty"),
                 F.sum(price).cast("decimal(18,2)").cast("double").alias("sum_base_price"),
                 F.sum(price * disc).cast("decimal(18,4)").cast("double").alias("sum_disc_price"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def q_revenue_by_nation(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (o.join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
                 .cast("decimal(18,2)").cast("double").alias("revenue"),
                 F.count("*").alias("n_orders"))
            .orderBy("n_name"))


# --- full pipeline (rows-only / self-verifying oracles) -------------------


_PIPE_CFG = EngineConfig(block_tokens=1 << 17, target_bucket_tokens=1 << 21)


def q_encode_manifest(spark, sf_dir):
    # cache: the bucket-stats pass and the encode pass would otherwise
    # each re-run the md5 tokenization (at 100 TB the token table is a
    # persisted Iceberg table, not a derived view — this mirrors that)
    toks = textops.tokenize_documents(_t(spark, sf_dir, "documents")).cache()
    blocks = encode_dataframe(toks, _PIPE_CFG)
    return (blocks.groupBy("source")
            .agg(F.count("*").alias("n_blocks"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.sum("orig_bytes").alias("orig_bytes"),
                 F.sum("comp_bytes").alias("comp_bytes"))
            .orderBy("source"))


def q_roundtrip_matches(spark, sf_dir):
    """Count docs whose decode is bit-identical, per source. The oracle
    is plain `count(*) per source` — so any roundtrip corruption shows
    up as a value mismatch against DuckDB."""
    toks = textops.tokenize_documents(_t(spark, sf_dir, "documents")).cache()
    # blocks has exactly ONE consumer (the decode side) — caching it
    # only added a memory-store write of the payload (round-2 regression)
    blocks = encode_dataframe(toks, _PIPE_CFG)
    decoded = decode_dataframe(blocks)
    joined = (toks.select("doc_id", "source", F.col("tokens").alias("t0"))
              .join(decoded.select("doc_id", F.col("tokens").alias("t1")),
                    "doc_id", "inner")
              .filter(F.col("t0").eqNullSafe(F.col("t1"))))
    return (joined.groupBy("source").agg(F.count("*").alias("n_docs_matched"))
            .orderBy("source"))


def q_streaming_backfill(spark, sf_dir):
    """Streaming ingest under the oracle gate: tokenize the documents
    table into landed parquet files, drain them through the
    foreachBatch incremental encoder, decode the committed blocks, and
    count bit-identical docs per source — the oracle is a plain
    count(*) per source, so ANY streaming-path corruption (duplicate
    epoch, lost wave, decode drift) shows up as a value mismatch."""
    from .engine import decode_dataframe, read_encoded
    from .streaming import encode_stream_backfill

    # cache key carries a fingerprint of the source table: regenerated
    # test data must never replay a stale input/checkpoint silently
    src_parquet = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src_parquet)
    sig = f"{st.st_size}_{int(st.st_mtime)}"
    base = os.path.join("/tmp/rle_spark_stream",
                        f"{os.path.basename(os.path.normpath(sf_dir))}_{sig}")
    inp = os.path.join(base, "input")
    out = os.path.join(base, "out")
    toks = textops.tokenize_documents(_t(spark, sf_dir, "documents"))
    if not os.path.exists(os.path.join(inp, "_SUCCESS")):
        toks.write.mode("overwrite").parquet(inp)
    encode_stream_backfill(spark, inp, out,
                           EngineConfig(block_tokens=1 << 16,
                                        layout="mapside"))
    decoded = decode_dataframe(read_encoded(spark, out))
    joined = (toks.select("doc_id", "source", F.col("tokens").alias("t0"))
              .join(decoded.select("doc_id", F.col("tokens").alias("t1")),
                    "doc_id", "inner")
              .filter(F.col("t0").eqNullSafe(F.col("t1"))))
    return (joined.groupBy("source")
            .agg(F.count("*").alias("n_docs_matched"))
            .orderBy("source"))


def q_multimodal_features(spark, sf_dir):
    """Multimodal binary plumbing under the oracle gate: decode +
    feature-extract the deterministic asset fixture through the
    mapInPandas path; the oracle reads the generation-time ground-truth
    columns straight from the same parquet."""
    from . import multimodal as M

    path = M.ensure_asset_parquet()
    assets = spark.read.parquet(path).select("asset_id", "modality",
                                             "payload")
    feats = M.extract_features(assets)
    # raw doubles: bit-identical to the generation-time numpy math, so
    # no engine-specific rounding semantics enter the comparison
    return (feats.select("asset_id", "modality", "n_bytes", "content_md5",
                         "mean_level", "byte_entropy")
            .orderBy("asset_id"))


def q_ivf_topk(spark, sf_dir):
    # inverted-file path: one-time write partitioned by ivf_list, then a
    # partition-pruned probe (identical values to ivf_topk_frozen)
    return similarity.ivf_topk_via_index(spark, sf_dir)
