"""File-granular parquet source: same kernel, pyarrow transport."""

import os

import pytest

from pyspark.sql import functions as F

from rle_spark.datagen import token_table
from rle_spark.engine import (EngineConfig, decode_dataframe, encode_dataframe,
                              roundtrip_mismatch_count)
from rle_spark.sources import (encode_parquet_dir, encode_parquet_dir_to_table,
                               plan_parquet_splits)

CFG = EngineConfig(block_tokens=1 << 15, layout="mapside")


def test_file_source_roundtrip(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("fsrc"))
    df = token_table(spark, 120, seed=21).cache()
    df.count()
    df.repartition(4).write.mode("overwrite").parquet(src)

    blocks = encode_parquet_dir(spark, src, CFG)
    decoded = decode_dataframe(blocks)
    assert roundtrip_mismatch_count(df, decoded) == 0

    # identical corpus totals as the DataFrame-transport mapside path
    want = (encode_dataframe(spark.read.parquet(src), CFG)
            .agg(F.sum("n_docs"), F.sum("n_tokens"), F.sum("orig_bytes"))
            .collect()[0])
    got = (encode_parquet_dir(spark, src, CFG)
           .agg(F.sum("n_docs"), F.sum("n_tokens"), F.sum("orig_bytes"))
           .collect()[0])
    assert tuple(got) == tuple(want)
    df.unpersist()


def test_file_source_full_job(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("fsrc2"))
    out = str(tmp_path_factory.mktemp("fout"))
    df = token_table(spark, 80, seed=22).cache()
    df.count()
    df.repartition(3).write.mode("overwrite").parquet(src)
    s = encode_parquet_dir_to_table(spark, src, out, CFG)
    assert s["n_docs"] == 80
    assert 0 < s["ratio"] < 1.0
    assert os.path.exists(os.path.join(out, "manifest"))
    from rle_spark.engine import read_encoded
    decoded = decode_dataframe(read_encoded(spark, out))
    assert roundtrip_mismatch_count(df, decoded) == 0
    df.unpersist()


def test_balanced_groups_cover_order_and_bytes():
    """_balanced_contiguous_groups: exact coverage in original order,
    exactly min(n, len) groups, and max group bytes no worse than the
    binary-search optimum it claims (checked against brute force on
    small inputs)."""
    import itertools
    import random
    from rle_spark.sources import _balanced_contiguous_groups

    def brute_opt(byts, n):
        # min over all contiguous partitions into exactly n groups
        m = len(byts)
        best = sum(byts)
        for cuts in itertools.combinations(range(1, m), n - 1):
            bounds = [0, *cuts, m]
            best = min(best, max(sum(byts[a:b])
                                 for a, b in zip(bounds, bounds[1:])))
        return best

    rng = random.Random(7)
    for trial in range(60):
        m = rng.randint(1, 9)
        units = [("p", i, i + 1, rng.randint(1, 100)) for i in range(m)]
        n = rng.randint(1, 12)
        gs = _balanced_contiguous_groups(units, n)
        assert len(gs) == min(n, m)
        assert [u for g in gs for u in g] == units  # order + coverage
        got = max(sum(u[3] for u in g) for g in gs)
        assert got == brute_opt([u[3] for u in units], min(n, m))


def test_split_planning_covers_all_row_groups(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("fsrc3"))
    df = token_table(spark, 60, seed=23)
    df.repartition(5).write.mode("overwrite").parquet(src)
    import pyarrow.parquet as pq
    import glob
    total_rgs = sum(pq.ParquetFile(p).metadata.num_row_groups
                    for p in glob.glob(os.path.join(src, "*.parquet")))
    # tiny target -> one split per row group; large target -> one per file
    fine = plan_parquet_splits(src, target_bytes=1)
    assert sum(g1 - g0 for _, g0, g1 in fine) == total_rgs
    coarse = plan_parquet_splits(src, target_bytes=1 << 40)
    assert sum(g1 - g0 for _, g0, g1 in coarse) == total_rgs
    assert len(coarse) <= len(fine)


def test_direct_writer_roundtrip_and_idempotence(spark, tmp_path_factory):
    from rle_spark.sources import (decode_parquet_dir_summary,
                                   encode_parquet_dir_direct)
    src = str(tmp_path_factory.mktemp("dsrc"))
    out = str(tmp_path_factory.mktemp("dout"))
    df = token_table(spark, 100, seed=24).cache()
    n_tok_total = df.agg(F.sum("n_tok")).collect()[0][0]
    df.repartition(4).write.mode("overwrite").parquet(src)

    s1 = encode_parquet_dir_direct(spark, src, out, CFG)
    assert s1["n_docs"] == 100 and 0 < s1["ratio"] < 1.0
    # decoded totals match the source exactly
    row = (decode_parquet_dir_summary(spark, out)
           .agg(F.sum("n_docs"), F.sum("n_tokens")).collect()[0])
    assert tuple(row) == (100, n_tok_total)
    # full bit-identity through the standard reader too
    from rle_spark.engine import read_encoded
    decoded = decode_dataframe(read_encoded(spark, out))
    assert roundtrip_mismatch_count(df, decoded) == 0

    # re-run overwrites the same task files: no duplicates, same totals
    s2 = encode_parquet_dir_direct(spark, src, out, CFG)
    assert s2["n_docs"] == 100 and s2["comp_bytes"] == s1["comp_bytes"]
    decoded2 = decode_dataframe(read_encoded(spark, out))
    assert roundtrip_mismatch_count(df, decoded2) == 0
    import glob
    assert not glob.glob(os.path.join(out, "blocks", ".part-*"))  # no tmp left
    df.unpersist()


def test_direct_writer_resume_skips_committed_tasks(spark, tmp_path_factory):
    """Executor-loss recovery: delete one committed task file, resume —
    only that task re-encodes (other files untouched by mtime), totals
    and roundtrip unchanged. A changed plan falls back to clean rewrite."""
    import glob
    import time as _time
    from rle_spark.sources import encode_parquet_dir_direct
    src = str(tmp_path_factory.mktemp("rsrc"))
    out = str(tmp_path_factory.mktemp("rout"))
    df = token_table(spark, 90, seed=25).cache()
    df.count()
    df.repartition(6).write.mode("overwrite").parquet(src)

    s1 = encode_parquet_dir_direct(spark, src, out, CFG, n_tasks=6)
    parts = sorted(glob.glob(os.path.join(out, "blocks", "part-*.parquet")))
    assert len(parts) >= 2
    victim = parts[0]
    survivors = {p: os.path.getmtime(p) for p in parts[1:]}
    os.remove(victim)
    _time.sleep(0.05)

    s2 = encode_parquet_dir_direct(spark, src, out, CFG, n_tasks=6,
                                   resume=True)
    assert s2["n_docs"] == s1["n_docs"] == 90
    assert s2["comp_bytes"] == s1["comp_bytes"]
    assert os.path.exists(victim)  # re-written
    for p, mt in survivors.items():
        assert os.path.getmtime(p) == mt  # untouched
    from rle_spark.engine import read_encoded
    decoded = decode_dataframe(read_encoded(spark, out))
    assert roundtrip_mismatch_count(df, decoded) == 0

    # plan change (different task count) -> stale mapping -> clean rewrite
    s3 = encode_parquet_dir_direct(spark, src, out, CFG, n_tasks=3,
                                   resume=True)
    assert s3["n_docs"] == 90
    parts3 = glob.glob(os.path.join(out, "blocks", "part-*.parquet"))
    assert len(parts3) <= 3  # no stale 6-task files left behind
    decoded3 = decode_dataframe(read_encoded(spark, out))
    assert roundtrip_mismatch_count(df, decoded3) == 0
    df.unpersist()


def test_split_planning_recursive_and_strict(spark, tmp_path_factory):
    """Partitioned layouts (streaming epoch dirs) plan recursively; a
    non-empty dir with zero parquet files raises instead of silently
    planning an empty table (round-2 advice)."""
    import pytest
    base = str(tmp_path_factory.mktemp("nested"))
    df = token_table(spark, 40, seed=28)
    df.write.mode("overwrite").parquet(os.path.join(base, "epoch=0"))
    df.write.mode("overwrite").parquet(os.path.join(base, "epoch=1"))
    units = plan_parquet_splits(base, target_bytes=1 << 40)
    assert {os.path.dirname(p) for p, _, _ in units} == {
        os.path.join(base, "epoch=0"), os.path.join(base, "epoch=1")}

    bogus = str(tmp_path_factory.mktemp("bogus"))
    open(os.path.join(bogus, "data.csv"), "w").write("x\n")
    with pytest.raises(ValueError, match="no .*parquet"):
        plan_parquet_splits(bogus)
    # truly empty dir still plans an empty list (no error)
    empty = str(tmp_path_factory.mktemp("empty"))
    assert plan_parquet_splits(empty) == []


def test_resume_config_change_forces_rewrite(spark, tmp_path_factory):
    """Changing a codec-affecting EngineConfig field between runs with
    resume=True must take the clean-rewrite path (the plan fingerprint
    covers the full config since round 3)."""
    import dataclasses
    import glob
    from rle_spark.selector import SelectorConfig
    from rle_spark.sources import encode_parquet_dir_direct
    src = str(tmp_path_factory.mktemp("cfg_src"))
    out = str(tmp_path_factory.mktemp("cfg_out"))
    df = token_table(spark, 50, seed=29).cache()
    df.count()
    df.repartition(4).write.mode("overwrite").parquet(src)
    encode_parquet_dir_direct(spark, src, out, CFG, n_tasks=4)
    parts = sorted(glob.glob(os.path.join(out, "blocks", "part-*.parquet")))
    mtimes = {p: os.path.getmtime(p) for p in parts}
    import time as _time
    _time.sleep(0.05)
    # same config + resume: all committed files untouched
    encode_parquet_dir_direct(spark, src, out, CFG, n_tasks=4, resume=True)
    assert all(os.path.getmtime(p) == mtimes[p] for p in parts)
    # restricted allow-list changes the codec choice -> full rewrite
    cfg2 = dataclasses.replace(
        CFG, selector=SelectorConfig(allow=["raw"]))
    s = encode_parquet_dir_direct(spark, src, out, cfg2, n_tasks=4,
                                  resume=True)
    assert any(os.path.getmtime(p) != mtimes[p] for p in parts)
    assert s["ratio"] >= 1.0  # raw-only: proof the new config applied
    from rle_spark.engine import read_encoded
    decoded = decode_dataframe(read_encoded(spark, out))
    assert roundtrip_mismatch_count(df, decoded) == 0
    df.unpersist()


def test_decode_parquet_dir_full(spark, tmp_path_factory):
    from rle_spark.sources import decode_parquet_dir, encode_parquet_dir_direct
    src = str(tmp_path_factory.mktemp("ddsrc"))
    out = str(tmp_path_factory.mktemp("ddout"))
    df = token_table(spark, 70, seed=26).cache()
    df.count()
    df.repartition(3).write.mode("overwrite").parquet(src)
    encode_parquet_dir_direct(spark, src, out, CFG)
    decoded = decode_parquet_dir(spark, out)
    assert roundtrip_mismatch_count(df, decoded) == 0
    df.unpersist()


def test_direct_writer_lineage(spark, tmp_path_factory):
    """Every committed task file carries a lineage record naming the
    exact input splits it consumed; metrics sum to the job summary and
    split coverage equals the plan."""
    import glob
    import json
    from rle_spark.sources import encode_parquet_dir_direct, plan_parquet_splits
    src = str(tmp_path_factory.mktemp("lsrc"))
    out = str(tmp_path_factory.mktemp("lout"))
    df = token_table(spark, 60, seed=27)
    df.repartition(5).write.mode("overwrite").parquet(src)
    s = encode_parquet_dir_direct(spark, src, out, CFG, n_tasks=5)
    recs = [json.load(open(p))
            for p in glob.glob(os.path.join(out, "lineage", "*.json"))]
    assert recs
    assert sum(r["n_docs"] for r in recs) == s["n_docs"]
    assert sum(r["comp_bytes"] for r in recs) == s["comp_bytes"]
    covered = {tuple(sp) for r in recs for sp in r["splits"]}
    planned = {(p, g0, g1) for p, g0, g1 in plan_parquet_splits(src)}
    assert covered == planned
    for r in recs:
        assert os.path.exists(os.path.join(out, "blocks", r["file"]))


def test_manifest_from_lineage_matches_spark_rescan(spark, tmp_path_factory):
    """The driver-side lineage fold and refresh_manifest's authoritative
    Spark rescan of the written blocks produce the SAME manifest rows
    (per-source/bucket totals and per-codec block counts), and the fold
    refuses (-> rescan fallback) when lineage doesn't cover the files."""
    import glob
    import json
    from rle_spark.engine import refresh_manifest
    from rle_spark.sources import encode_parquet_dir_direct, manifest_from_lineage
    src = str(tmp_path_factory.mktemp("msrc"))
    out = str(tmp_path_factory.mktemp("mout"))
    df = token_table(spark, 70, seed=28)
    df.repartition(4).write.mode("overwrite").parquet(src)
    encode_parquet_dir_direct(spark, src, out, CFG, n_tasks=4)

    def manifest_rows():
        rows = (spark.read.parquet(os.path.join(out, "manifest"))
                .collect())
        return sorted(
            (r["source"], r["bucket"], r["n_blocks"], r["n_docs"],
             r["n_tokens"], r["orig_bytes"], r["comp_bytes"],
             tuple(sorted(r["codecs"].items())), r["engine_version"])
            for r in rows)

    from_lineage = manifest_rows()
    assert from_lineage  # non-empty
    refresh_manifest(spark, out)  # overwrite with the rescan version
    assert manifest_rows() == from_lineage

    # skip path (committed files) rebuilds identical lineage + manifest
    for p in glob.glob(os.path.join(out, "lineage", "*.json")):
        os.remove(p)
    encode_parquet_dir_direct(spark, src, out, CFG, n_tasks=4, resume=True)
    assert manifest_rows() == from_lineage

    # coverage guard: drop one lineage record -> fold refuses
    victim = sorted(glob.glob(os.path.join(out, "lineage", "*.json")))[0]
    os.remove(victim)
    assert manifest_from_lineage(out) is False
    # pre-rollup (old-format) lineage -> fold refuses
    rest = sorted(glob.glob(os.path.join(out, "lineage", "*.json")))
    rec = json.load(open(rest[0]))
    rec.pop("groups")
    base = os.path.basename(victim)
    json.dump({**rec, "file": base.replace(".json", ".parquet")},
              open(victim, "w"))
    json.dump(rec, open(rest[0], "w"))
    assert manifest_from_lineage(out) is False


def test_readahead_order_errors_and_disable():
    """The scan readahead must preserve order, re-raise producer
    exceptions in the consumer, and pass through untouched at depth 0."""
    from rle_spark.sources import _readahead

    def gen():
        yield from range(100)

    assert list(_readahead(gen)) == list(range(100))
    assert list(_readahead(gen, depth=0)) == list(range(100))
    assert list(_readahead(gen, depth=1)) == list(range(100))

    def boom():
        yield 1
        raise ValueError("scan failed")

    out = []
    with pytest.raises(ValueError, match="scan failed"):
        for x in _readahead(boom):
            out.append(x)
    assert out == [1]
