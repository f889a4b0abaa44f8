"""Scale-safe analyze operators vs naive in-memory references.

The distributed kernels (range partition + per-task NumPy + O(P)
driver boundary merge) must be bit-identical to a straightforward
single-array computation on the same data."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from rle_spark import analyze
from rle_spark.codecs.base import find_runs


@pytest.fixture(scope="module")
def seq_df(spark):
    """A char-per-row table with runs, spread over many partitions."""
    rng = np.random.default_rng(3)
    chars = np.repeat(
        np.array(list("ABCDEF"))[rng.integers(0, 6, 4000)],
        rng.integers(1, 9, 4000))
    pdf = pd.DataFrame({"pos": np.arange(len(chars)), "ch": chars})
    return spark.createDataFrame(pdf).repartition(8).cache(), chars


def test_partition_runs_matches_naive(spark, seq_df):
    df, chars = seq_df
    runs = analyze.partition_runs(df, "ch", ["pos"]).collect()
    starts, lens = find_runs(chars)
    want = {(int(s) + 1, chars[s], int(ln))
            for s, ln in zip(starts, lens)}
    got = {(r.start_rn, r.value, r.run_len) for r in runs}
    assert got == want


def test_with_global_rn_matches_order(spark, seq_df):
    df, chars = seq_df
    rows = analyze.with_global_rn(df, "ch", ["pos"]).collect()
    assert len(rows) == len(chars)
    for r in rows[:50] + rows[-50:]:
        assert chars[r.rn - 1] == r.value
    assert sorted(r.rn for r in rows) == list(range(1, len(chars) + 1))


def _naive_width_hist(chars, w):
    m = len(chars) // w
    syms = np.array(["".join(chars[i * w:(i + 1) * w]) for i in range(m)])
    _, lens = find_runs(syms)
    bc = np.int64(np.floor(np.log2(lens)))
    vals, counts = np.unique(bc, return_counts=True)
    return {int(v): int(c) for v, c in zip(vals, counts)}


@pytest.mark.parametrize("w", [2, 3, 4])
def test_sym_width_run_histogram(spark, seq_df, w):
    df, chars = seq_df
    got = {r.bit_class: r.n_runs for r in
           analyze.sym_width_run_histogram(df, "ch", ["pos"], w).collect()}
    assert got == _naive_width_hist(chars, w)


def _naive_unaligned_hist(chars, stride):
    n = len(chars)
    eq = np.zeros(n, dtype=bool)
    eq[stride:] = chars[stride:] == chars[:-stride]
    starts, lens = find_runs(eq)
    lens = lens[eq[starts]]
    covered = lens + stride
    bc = np.int64(np.floor(np.log2(covered)))
    vals, counts = np.unique(bc, return_counts=True)
    return {int(v): int(c) for v, c in zip(vals, counts)}


@pytest.mark.parametrize("stride", [1, 2, 3])
def test_unaligned_run_histogram(spark, seq_df, stride):
    df, chars = seq_df
    got = {r.bit_class: r.n_runs for r in
           analyze.unaligned_run_histogram(df, "ch", ["pos"],
                                           stride).collect()}
    assert got == _naive_unaligned_hist(chars, stride)


def _naive_lru(chars, ks, min_run):
    starts, lens = find_runs(chars)
    vals = [chars[s] for s, ln in zip(starts, lens) if ln >= min_run]
    out = {}
    for k in ks:
        hits = sum(1 for i, v in enumerate(vals)
                   if v in vals[max(0, i - k):i])
        out[k] = (hits, len(vals))
    return out


def test_lru_recurrence_matches_naive(spark, seq_df):
    df, chars = seq_df
    ks = (1, 3, 7)
    got = {r.k: (r.n_hits, r.n_runs) for r in
           analyze.lru_recurrence(df, "ch", ["pos"], ks=ks,
                                  min_run=2).collect()}
    assert got == _naive_lru(chars, ks, 2)


def test_lru_recurrence_monotone_in_k(spark, seq_df):
    df, _ = seq_df
    rows = sorted(analyze.lru_recurrence(df, "ch", ["pos"]).collect(),
                  key=lambda r: r.k)
    hits = [r.n_hits for r in rows]
    assert hits == sorted(hits)  # bigger LUT window never loses hits


def _naive_run_stats(chars):
    starts, lens = find_runs(chars)
    out = {}
    for s, ln in zip(starts, lens):
        st = out.setdefault(chars[s], [0, 0, 0])
        st[0] += 1
        st[1] += int(ln)
        st[2] = max(st[2], int(ln))
    return {v: tuple(st) for v, st in out.items()}


def test_run_stats_matches_naive(spark, seq_df):
    df, chars = seq_df
    got = {r.value: (r.n_runs, r.total_len, r.max_run_len) for r in
           analyze.run_stats(df, "ch", ["pos"]).collect()}
    assert got == _naive_run_stats(chars)


def test_run_length_histogram_matches_naive(spark, seq_df):
    df, chars = seq_df
    _, lens = find_runs(chars)
    bc = np.int64(np.floor(np.log2(lens)))
    vals, counts = np.unique(bc, return_counts=True)
    want = {int(v): int(c) for v, c in zip(vals, counts)}
    got = {r.bit_class: r.n_runs for r in
           analyze.run_length_histogram(df, "ch", ["pos"]).collect()}
    assert got == want


@pytest.mark.parametrize("cap", [8, 64])
def test_exact_run_length_histogram_matches_naive(spark, seq_df, cap):
    df, chars = seq_df
    _, lens = find_runs(chars)
    lens = lens[lens <= cap]
    vals, counts = np.unique(lens, return_counts=True)
    want = {int(v): int(c) for v, c in zip(vals, counts)}
    got = {r.run_len: r.n_runs for r in
           analyze.exact_run_length_histogram(df, "ch", ["pos"],
                                              cap=cap).collect()}
    assert got == want


def test_exact_histogram_sums_to_bit_class_total(spark, seq_df):
    """With an uncapped bucket array the exact histogram must cover
    every run the bit-class table covers (same kernel, same runs)."""
    df, chars = seq_df
    _, lens = find_runs(chars)
    exact = analyze.exact_run_length_histogram(
        df, "ch", ["pos"], cap=int(lens.max())).collect()
    bc = analyze.run_length_histogram(df, "ch", ["pos"]).collect()
    assert sum(r.n_runs for r in exact) == sum(r.n_runs for r in bc)


def test_folded_kernels_leave_no_persists(spark, seq_df):
    """run_stats / run_length_histogram / both histograms fully release
    their pinned intermediates before returning (round-2 advice: the
    pool must not grow across repeated analyses)."""
    df, _ = seq_df
    analyze.clear_run_cache()
    analyze.run_stats(df, "ch", ["pos"]).collect()
    analyze.run_length_histogram(df, "ch", ["pos"]).collect()
    analyze.sym_width_run_histogram(df, "ch", ["pos"], 2).collect()
    analyze.unaligned_run_histogram(df, "ch", ["pos"], 2).collect()
    assert analyze._PERSIST_POOL == []


def test_folded_kernels_many_tiny_partitions(spark):
    """Boundary stitch stress: 48 range partitions over short runs so
    nearly every run touches a task edge; single giant run too."""
    rng = np.random.default_rng(7)
    chars = np.repeat(np.array(list("AB"))[rng.integers(0, 2, 600)],
                      rng.integers(1, 4, 600))
    pdf = pd.DataFrame({"pos": np.arange(len(chars)), "ch": chars})
    df = spark.createDataFrame(pdf).repartition(48)
    assert ({r.value: (r.n_runs, r.total_len, r.max_run_len) for r in
             analyze.run_stats(df, "ch", ["pos"]).collect()}
            == _naive_run_stats(chars))
    got = {r.bit_class: r.n_runs for r in
           analyze.sym_width_run_histogram(df, "ch", ["pos"], 3).collect()}
    assert got == _naive_width_hist(chars, 3)
    got = {r.bit_class: r.n_runs for r in
           analyze.unaligned_run_histogram(df, "ch", ["pos"], 2).collect()}
    assert got == _naive_unaligned_hist(chars, 2)

    one = pd.DataFrame({"pos": range(3000), "ch": ["Z"] * 3000})
    dfo = spark.createDataFrame(one).repartition(48)
    rows = analyze.run_stats(dfo, "ch", ["pos"]).collect()
    assert [(r.value, r.n_runs, r.total_len, r.max_run_len)
            for r in rows] == [("Z", 1, 3000, 3000)]
    hist = {r.bit_class: r.n_runs for r in
            analyze.run_length_histogram(dfo, "ch", ["pos"]).collect()}
    assert hist == {3000 .bit_length() - 1: 1}


def test_partition_runs_single_value_column(spark):
    # one giant run spanning every partition boundary
    pdf = pd.DataFrame({"pos": range(5000), "ch": ["X"] * 5000})
    df = spark.createDataFrame(pdf).repartition(8)
    runs = analyze.partition_runs(df, "ch", ["pos"]).collect()
    assert len(runs) == 1
    assert (runs[0].start_rn, runs[0].value, runs[0].run_len) == (1, "X", 5000)


def test_partition_runs_empty(spark):
    df = spark.createDataFrame(pd.DataFrame({"pos": [], "ch": []}),
                               "pos long, ch string")
    assert analyze.partition_runs(df, "ch", ["pos"]).count() == 0


def test_ref_rle8_size_fused_matches_exact_model(spark):
    """The fused kernel+driver chain of ref_rle8_size_v1 must equal
    codecs.refmodel.ref_rle_size_model_v1 on the same byte stream,
    including under heavy task fragmentation (48 partitions) where
    every candidate chain crosses task edges."""
    from rle_spark.codecs.refmodel import ref_rle_size_model_v1
    rng = np.random.default_rng(17)
    # long runs (model-eligible), short runs, and literals mixed
    chars = np.repeat(np.array(list("ABC"))[rng.integers(0, 3, 900)],
                      rng.choice([1, 1, 2, 5, 9, 40, 300],
                                 900, p=[.3, .2, .2, .1, .1, .05, .05]))
    other = np.array(list("XY"))[rng.integers(0, 2, len(chars))]
    pdf = pd.DataFrame({"pos": np.arange(len(chars)),
                        "c1": chars, "c2": other})
    df = spark.createDataFrame(pdf).repartition(48)
    got = {r.col_name: r.model_bytes for r in
           analyze.ref_rle8_size_v1(df, ["c1", "c2"], ["pos"]).collect()}
    want = {
        "c1": ref_rle_size_model_v1(chars.astype("U1").view(np.uint32)
                                    .astype(np.uint8)),
        "c2": ref_rle_size_model_v1(other.astype("U1").view(np.uint32)
                                    .astype(np.uint8)),
    }
    assert got == want


def test_query_surface_persist_pool_bounded(spark):
    """Repeated analyze-family query calls (the bench loop) keep at
    most ONE pinned intermediate: run_extract releases previous pins at
    entry; every other rewritten query releases its own before return."""
    from rle_spark import queries as Q
    sf = "/root/testdata/sf0.001"
    analyze.clear_run_cache()
    for _ in range(3):
        Q.q_run_extract_orderstatus(spark, sf).count()
        Q.q_run_stats_returnflag(spark, sf).count()
        Q.q_ref_rle8_size(spark, sf).count()
    assert len(analyze._PERSIST_POOL) <= 1
    analyze.clear_run_cache()


# --- ParquetSource shuffle-free arranged fast path -------------------------


def _write_pq(tmp_path, pdf, name, row_group_size):
    import pyarrow as pa
    import pyarrow.parquet as pq
    p = str(tmp_path / name)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p,
                   row_group_size=row_group_size)
    return p


def _mk_pdf(n=6000, seed=7):
    rng = np.random.default_rng(seed)
    chars = np.repeat(np.array(list("ABCD"))[rng.integers(0, 4, n // 4)],
                      rng.integers(1, 9, n // 4))[:n]
    if len(chars) < n:
        chars = np.concatenate(
            [chars, np.full(n - len(chars), "A", dtype=chars.dtype)])
    return pd.DataFrame({"pos": np.arange(n, dtype=np.int64),
                         "ln": (np.arange(n, dtype=np.int64) % 3),
                         "ch": chars})


def test_fast_path_engages_on_sorted_multi_rg(spark, tmp_path):
    pdf = _mk_pdf()
    p = _write_pq(tmp_path, pdf, "sorted.parquet", 500)
    src = analyze.ParquetSource(spark, p)
    fast = analyze._ranged_parquet(src, ["ch"], ["pos"])
    assert fast is not None
    # bit-identical to the shuffle path on every analyze surface
    got = analyze.run_stats(src, "ch", ["pos"]).collect()[0]
    want = analyze.run_stats(spark.read.parquet(p), "ch",
                             ["pos"]).collect()[0]
    assert got.asDict() == want.asDict()
    runs_fast = sorted((r.start_rn, r.value, r.run_len) for r in
                       analyze.partition_runs(src, "ch", ["pos"]).collect())
    runs_slow = sorted((r.start_rn, r.value, r.run_len) for r in
                       analyze.partition_runs(spark.read.parquet(p), "ch",
                                              ["pos"]).collect())
    assert runs_fast == runs_slow
    analyze.clear_run_cache()


def test_fast_path_range_clustered_locally_unsorted(spark, tmp_path):
    """Row groups cover disjoint key ranges but rows inside each group
    are shuffled: the per-unit local sort must repair the order and
    produce results identical to the shuffle path."""
    pdf = _mk_pdf()
    rng = np.random.default_rng(11)
    chunks = []
    for lo in range(0, len(pdf), 500):
        c = pdf.iloc[lo:lo + 500]
        chunks.append(c.iloc[rng.permutation(len(c))])
    scrambled = pd.concat(chunks, ignore_index=True)
    p = _write_pq(tmp_path, scrambled, "clustered.parquet", 500)
    src = analyze.ParquetSource(spark, p)
    assert analyze._ranged_parquet(src, ["ch"], ["pos"]) is not None
    got = analyze.run_stats(src, "ch", ["pos"]).collect()[0]
    want = analyze.run_stats(spark.read.parquet(p), "ch",
                             ["pos"]).collect()[0]
    assert got.asDict() == want.asDict()
    analyze.clear_run_cache()


def test_fast_path_declines_on_overlap_and_coarse(spark, tmp_path):
    pdf = _mk_pdf()
    rng = np.random.default_rng(13)
    shuffled = pdf.iloc[rng.permutation(len(pdf))].reset_index(drop=True)
    p_overlap = _write_pq(tmp_path, shuffled, "overlap.parquet", 500)
    src = analyze.ParquetSource(spark, p_overlap)
    assert analyze._plan_sorted_units(src, "pos") is None
    assert analyze._ranged_parquet(src, ["ch"], ["pos"]) is None
    # single row group: provable but too coarse to parallelize
    p_one = _write_pq(tmp_path, pdf, "one_rg.parquet", len(pdf))
    src1 = analyze.ParquetSource(spark, p_one)
    assert analyze._plan_sorted_units(src1, "pos") is not None
    assert analyze._ranged_parquet(src1, ["ch"], ["pos"]) is None
    # and the public surface still answers correctly via the fallback
    got = analyze.run_stats(src1, "ch", ["pos"]).collect()[0]
    want = analyze.run_stats(spark.read.parquet(p_one), "ch",
                             ["pos"]).collect()[0]
    assert got.asDict() == want.asDict()
    analyze.clear_run_cache()


def test_fast_path_runtime_guard_on_lying_footers(spark, tmp_path,
                                                  monkeypatch):
    """If footer stats claimed disjoint ranges but the data overlaps,
    the task-side boundary assert must fail the job, not emit a wrong
    arrangement."""
    pdf = _mk_pdf()
    p = _write_pq(tmp_path, pdf, "lie.parquet", 500)
    src = analyze.ParquetSource(spark, p)
    real = analyze._plan_sorted_units(src, "pos")
    assert real is not None and len(real) >= 4
    lied = [real[1], real[0], *real[2:]]  # wrong unit order
    monkeypatch.setattr(analyze, "_plan_sorted_units",
                        lambda *_a, **_k: lied)
    fast = analyze._ranged_parquet(src, ["ch"], ["pos"])
    assert fast is not None
    with pytest.raises(Exception, match="overlaps its predecessor"):
        fast.count()


def test_column_codec_stats_memo(spark, tmp_path):
    pdf = _mk_pdf()
    p = _write_pq(tmp_path, pdf, "memo.parquet", 1000)
    src = analyze.ParquetSource(spark, p)
    first = analyze.column_codec_stats(src, ["pos", "ln"],
                                       ["pos"]).collect()
    key = (src.fingerprint(), ("pos", "ln"), ("pos",))
    assert key in analyze._STATS_MEMO
    again = analyze.column_codec_stats(src, ["pos", "ln"],
                                       ["pos"]).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, again))
    # a rewritten file must not serve stale stats
    import time
    time.sleep(1.1)
    _write_pq(tmp_path, pdf.iloc[: len(pdf) // 2], "memo.parquet", 1000)
    src2 = analyze.ParquetSource(spark, p)
    fresh = {r.col_name: r.n_values for r in
             analyze.column_codec_stats(src2, ["pos", "ln"],
                                        ["pos"]).collect()}
    assert fresh["pos"] == len(pdf) // 2
    analyze.clear_run_cache()


def test_fast_path_nested_field_before_order_key(spark, tmp_path):
    """A struct column preceding the order key shifts leaf (DFS) footer
    indices away from arrow field order; the planner must still read
    min/max from the order key's own leaf (located by path_in_schema),
    so the fast path stays engaged AND correct."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    pdf = _mk_pdf()
    n = len(pdf)
    rng = np.random.default_rng(5)
    # meta.b is deliberately random: if the planner mistakenly read
    # leaf index 1 (= meta.b) it would see overlapping ranges and
    # silently fall back — or worse, 'prove' clustering on wrong data
    meta = pa.StructArray.from_arrays(
        [pa.array(np.zeros(n, dtype=np.int64)),
         pa.array(rng.integers(0, 10, n))], names=["a", "b"])
    t = pa.table({"meta": meta, "pos": pa.array(pdf["pos"]),
                  "ch": pa.array(pdf["ch"])})
    p = str(tmp_path / "nested.parquet")
    pq.write_table(t, p, row_group_size=500)
    src = analyze.ParquetSource(spark, p)
    units = analyze._plan_sorted_units(src, "pos")
    assert units is not None and len(units) == (n + 499) // 500
    fast = analyze._ranged_parquet(src, ["ch"], ["pos"])
    assert fast is not None
    got = analyze.run_stats(src, "ch", ["pos"]).collect()[0]
    want = analyze.run_stats(spark.read.parquet(p), "ch",
                             ["pos"]).collect()[0]
    assert got.asDict() == want.asDict()
    analyze.clear_run_cache()


def test_fast_path_cross_task_boundary_guard(spark, tmp_path,
                                             monkeypatch):
    """With one unit per task (n_units <= defaultParallelism) every
    unit boundary is a task boundary: the shipped predecessor planned
    max must still catch a lying footer."""
    pdf = _mk_pdf()
    p = _write_pq(tmp_path, pdf, "lie2.parquet", 1000)
    src = analyze.ParquetSource(spark, p)
    real = analyze._plan_sorted_units(src, "pos")
    assert real is not None
    assert 4 <= len(real) <= spark.sparkContext.defaultParallelism
    # claim unit 1 covers a range ABOVE unit 2 (swap plan positions but
    # keep each unit's shipped pmax consistent with the lying plan)
    lied = list(real)
    (f1, g1, _), (f2, g2, _) = lied[1], lied[2]
    lied[1] = (f2, g2, lied[1][2])
    lied[2] = (f1, g1, lied[2][2])
    monkeypatch.setattr(analyze, "_plan_sorted_units",
                        lambda *_a, **_k: lied)
    fast = analyze._ranged_parquet(src, ["ch"], ["pos"])
    assert fast is not None
    with pytest.raises(Exception, match="overlaps its predecessor"):
        fast.count()


def test_column_codec_stats_nullable_int(spark):
    """A nullable int column arrives in the kernel as float64 + NaN;
    nulls must be ignored (Spark min/max semantics), not crash int()."""
    rows = [(i, None if i % 7 == 3 else (i % 5) + 10)
            for i in range(4000)]
    df = spark.createDataFrame(rows, "pos long, v long").repartition(4)
    got = {r.col_name: r for r in
           analyze.column_codec_stats(df, ["v"], ["pos"]).collect()}
    vals = np.array([v for _, v in rows if v is not None])
    assert got["v"].vmin == int(vals.min())
    assert got["v"].vmax == int(vals.max())
    assert got["v"].n_distinct == len(np.unique(vals))
    analyze.clear_run_cache()
