"""Column analysis operators — the --analyze feature extractor
(/root/reference/src/main.c:1246-2257) re-expressed two ways:

  * `run_stats` / `run_extract`: pure window-function SQL (JVM-side,
    scales to any column; the gaps-and-islands run-grouping idiom).
  * `column_codec_stats` / `ref_rle8_size_v1`: the engine's NumPy
    kernels (block_stats / refmodel) driven through mapInPandas with a
    streaming accumulator — DuckDB SQL reproduces both independently,
    which is the correctness oracle for the kernel implementations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

from .codecs.base import bit_width, find_runs
from .codecs.refmodel import ref_rle_size_model_v1


def run_stats(df: DataFrame, col: str, order: list[str]) -> DataFrame:
    """Per-value run statistics of `col` under the given total order."""
    w_all = Window.orderBy(*order)
    w_val = Window.partitionBy(col).orderBy(*order)
    runs = (df.select(F.col(col).alias("value"),
                      (F.row_number().over(w_all)
                       - F.row_number().over(w_val)).alias("grp"))
            .groupBy("value", "grp").agg(F.count("*").alias("run_len")))
    return (runs.groupBy("value")
            .agg(F.count("*").alias("n_runs"),
                 F.sum("run_len").alias("total_len"),
                 F.max("run_len").alias("max_run_len"))
            .orderBy("value"))


def run_extract(df: DataFrame, col: str, order: list[str]) -> DataFrame:
    """Materialized run list (start_rn, value, run_len) — the decoded
    form of an RLE stream, SQL-checkable."""
    w_all = Window.orderBy(*order)
    w_val = Window.partitionBy(col).orderBy(*order)
    runs = (df.select(F.col(col).alias("value"),
                      F.row_number().over(w_all).alias("rn"),
                      (F.row_number().over(w_all)
                       - F.row_number().over(w_val)).alias("grp"))
            .groupBy("value", "grp")
            .agg(F.min("rn").cast("long").alias("start_rn"),
                 F.count("*").alias("run_len")))
    return runs.select("start_rn", "value", "run_len").orderBy("start_rn")


def run_length_histogram(df: DataFrame, col: str, order: list[str]) -> DataFrame:
    """Run lengths bucketed by bit class (floor(log2(len))) — the
    AnalyzeData run-length histogram (/root/reference/src/main.c:1246+,
    'run lengths by bit-class'), as a window+agg plan."""
    w_all = Window.orderBy(*order)
    w_val = Window.partitionBy(col).orderBy(*order)
    runs = (df.select(F.col(col).alias("value"),
                      (F.row_number().over(w_all)
                       - F.row_number().over(w_val)).alias("grp"))
            .groupBy("value", "grp").agg(F.count("*").alias("run_len")))
    bit_class = (F.length(F.bin(F.col("run_len"))) - 1).alias("bit_class")
    return (runs.select(bit_class)
            .groupBy("bit_class")
            .agg(F.count("*").alias("n_runs"))
            .orderBy("bit_class"))


def column_codec_stats(df: DataFrame, cols: list[str],
                       order: list[str]) -> DataFrame:
    """Whole-column codec stats (n, min, max, distinct, runs) computed
    by the engine's vectorized kernels with a cross-batch accumulator.

    The total order is enforced by a single-partition sort: this is the
    oracle-checkable whole-column variant; production stats are
    per-block and merged (selector.block_stats)."""
    arranged = (df.select(*dict.fromkeys([*order, *cols]))
                .repartition(1).sortWithinPartitions(*order))

    def it(batches):
        acc = {c: {"n": 0, "vmin": None, "vmax": None, "n_runs": 0,
                   "last": None, "uniq": set()} for c in cols}
        for pdf in batches:
            for c in cols:
                a = pdf[c].to_numpy()
                if len(a) == 0:
                    continue
                st = acc[c]
                st["n"] += len(a)
                mn, mx = a.min(), a.max()
                st["vmin"] = mn if st["vmin"] is None else min(st["vmin"], mn)
                st["vmax"] = mx if st["vmax"] is None else max(st["vmax"], mx)
                _, lens = find_runs(a)
                st["n_runs"] += len(lens)
                if st["last"] is not None and len(a) and a[0] == st["last"]:
                    st["n_runs"] -= 1  # batch boundary joins two runs
                st["last"] = a[-1]
                st["uniq"].update(np.unique(a).tolist())
        yield pd.DataFrame({
            "col_name": cols,
            "n_values": [acc[c]["n"] for c in cols],
            "vmin": [int(acc[c]["vmin"]) for c in cols],
            "vmax": [int(acc[c]["vmax"]) for c in cols],
            "n_distinct": [len(acc[c]["uniq"]) for c in cols],
            "n_runs": [acc[c]["n_runs"] for c in cols],
        })

    schema = ("col_name string, n_values long, vmin long, vmax long, "
              "n_distinct long, n_runs long")
    return arranged.mapInPandas(it, schema)


def ref_rle8_size_v1(df: DataFrame, cols: list[str],
                     order: list[str]) -> DataFrame:
    """Reference width-8 RLE size (model v1) of each single-char string
    column's byte stream, computed by the NumPy yardstick
    (codecs.refmodel.ref_rle_size_model_v1)."""
    arranged = (df.select(*dict.fromkeys([*order, *cols]))
                .repartition(1).sortWithinPartitions(*order))

    def it(batches):
        parts: dict[str, list[np.ndarray]] = {c: [] for c in cols}
        for pdf in batches:
            for c in cols:
                chars = pdf[c].astype(str).str.encode("ascii")
                parts[c].append(np.frombuffer(b"".join(chars), dtype=np.uint8))
        yield pd.DataFrame({
            "col_name": cols,
            "model_bytes": [
                int(ref_rle_size_model_v1(
                    np.concatenate(parts[c]) if parts[c] else
                    np.zeros(0, np.uint8), 1))
                for c in cols],
        })

    return arranged.mapInPandas(it, "col_name string, model_bytes long")


# estimate formulas shared with the SQL oracle (q_codec_selection):
# keep in sync with __spark_entry__.py oracle text


def est_for_bitpack(n: int, vmin: int, vmax: int) -> int:
    return 17 + (n * bit_width(vmax - vmin) + 7) // 8


def est_dict_bitpack(n: int, vmin: int, vmax: int, k: int) -> int:
    dict_bytes = 17 + (k * bit_width(vmax - vmin) + 7) // 8
    return dict_bytes + 17 + (n * bit_width(max(k - 1, 0)) + 7) // 8


def est_raw(n: int) -> int:
    return 16 + 4 * n


def codec_selection(stats: DataFrame) -> DataFrame:
    """Pick argmin(raw, for_bitpack, dict_bitpack) from column stats —
    the cost-model selector's decision, SQL-reproducible."""
    # bit_width as a SQL expression: floor(log2(x))+1 is float-unsafe;
    # use the string length of the binary representation instead.
    def bw(colx):
        return F.when(colx <= 0, F.lit(0)).otherwise(
            F.length(F.bin(colx.cast("long"))))

    n, span, k = F.col("n_values"), F.col("vmax") - F.col("vmin"), F.col("n_distinct")
    est_raw_c = F.lit(16) + 4 * n
    est_for_c = F.lit(17) + F.floor((n * bw(span) + 7) / 8)
    est_dict_c = (F.lit(34) + F.floor((k * bw(span) + 7) / 8)
                  + F.floor((n * bw(k - 1) + 7) / 8))
    best = F.least(est_raw_c, est_for_c, est_dict_c)
    chosen = (F.when(est_for_c == best, F.lit("for_bitpack"))
              .when(est_dict_c == best, F.lit("dict_bitpack"))
              .otherwise(F.lit("raw")))
    return stats.select(
        "col_name",
        est_raw_c.cast("long").alias("est_raw"),
        est_for_c.cast("long").alias("est_for_bitpack"),
        est_dict_c.cast("long").alias("est_dict_bitpack"),
        chosen.alias("chosen_codec"),
    ).orderBy("col_name")
