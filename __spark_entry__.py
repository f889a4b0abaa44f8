"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship pipeline (tokenize documents ->
bucket-planned encode -> per-source manifest) at sf0.001.
`queries()` / `oracle_sql()` pair every implemented operator from
SURVEY.md §2 with a DuckDB oracle; rows-only entries (no oracle) are
the genuinely non-SQL ops (actual payload encoding, xxhash-based
simhash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from rle_spark import queries as Q  # noqa: E402
from rle_spark.textops import STOPWORDS  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"

TOKEN_ID = "(('0x'||substr(md5({w}),1,8))::BIGINT % 50257)"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tokenize sf0.001 documents, run the full encode
    pipeline, return the per-source manifest summary."""
    return Q.q_encode_manifest(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # codec / engine family (SURVEY.md §2.1, §2.3)
        "run_stats_returnflag": Q.q_run_stats_returnflag,
        "run_extract_orderstatus": Q.q_run_extract_orderstatus,
        "run_length_histogram": Q.q_run_length_histogram,
        "width2_run_histogram": Q.q_width2_run_histogram,
        "unaligned2_run_histogram": Q.q_unaligned2_run_histogram,
        "width3_run_histogram": Q.q_width3_run_histogram,
        "unaligned3_run_histogram": Q.q_unaligned3_run_histogram,
        "exact_run_histogram": Q.q_exact_run_histogram,
        "width4_run_histogram": Q.q_width4_run_histogram,
        "unaligned4_run_histogram": Q.q_unaligned4_run_histogram,
        "width6_run_histogram": Q.q_width6_run_histogram,
        "unaligned6_run_histogram": Q.q_unaligned6_run_histogram,
        "width8_run_histogram": Q.q_width8_run_histogram,
        "unaligned8_run_histogram": Q.q_unaligned8_run_histogram,
        "width16_run_histogram": Q.q_width16_run_histogram,
        "unaligned16_run_histogram": Q.q_unaligned16_run_histogram,
        "lru_recurrence": Q.q_lru_recurrence,
        "ref_rle8_size": Q.q_ref_rle8_size,
        "column_codec_stats": Q.q_column_codec_stats,
        "codec_selection": Q.q_codec_selection,
        "tokenize_stats": Q.q_tokenize_stats,
        "token_runs_by_source": Q.q_token_runs_by_source,
        "encode_manifest": Q.q_encode_manifest,      # rows-only
        "roundtrip_matches": Q.q_roundtrip_matches,  # oracle == plain counts
        # dedup family
        "dedup_exact": Q.q_dedup_exact,
        "minhash_signatures": Q.q_minhash_signatures,
        "near_dup_buckets": Q.q_near_dup_buckets,
        "simhash": Q.q_simhash,
        "ngram_jaccard_pairs": Q.q_ngram_jaccard_pairs,
        # text analysis
        "quality_by_source": Q.q_quality_by_source,
        "langid_counts": Q.q_langid_counts,
        "doc_fingerprint": Q.q_doc_fingerprint,
        # similarity
        "embedding_quantize": Q.q_embedding_quantize,
        "ann_topk": Q.q_ann_topk,
        "ivf_topk": Q.q_ivf_topk,
        "cosine_near_dup": Q.q_cosine_near_dup,
        "cosine_near_dup_pinned": Q.q_cosine_near_dup_pinned,
        "cosine_near_dup_auto": Q.q_cosine_near_dup_auto,
        # streaming ingest + multimodal plumbing (oracle-gated)
        "streaming_backfill": Q.q_streaming_backfill,
        "multimodal_features": Q.q_multimodal_features,
        # classic OLAP sanity
        "pricing_summary": Q.q_pricing_summary,
        "revenue_by_nation": Q.q_revenue_by_nation,
    }


def _runs_cte(col: str, table: str, order: str) -> str:
    return f"""
      SELECT count(*) AS run_len, min(rn) AS s, v AS value
      FROM (
        SELECT {col} AS v, rn,
               rn - row_number() OVER (PARTITION BY {col} ORDER BY rn) AS grp
        FROM (SELECT {col}, row_number() OVER (ORDER BY {order}) AS rn
              FROM {table})
      ) GROUP BY v, grp
    """


def _ref_rle8_sql(col: str) -> str:
    return f"""
    SELECT '{col}' AS col_name,
           CAST(8 + COALESCE(SUM(CASE WHEN emitted THEN cmd END), 0)
              + (SELECT count(*) FROM lineitem)
              - COALESCE(SUM(CASE WHEN emitted THEN len END), 0)
              + 11 AS BIGINT) AS model_bytes
    FROM (
      SELECT len, rng,
             -- long-form emit threshold = refmodel._min_long(1) = 12
             ((rng <= 255) OR len >= 12) AS emitted,
             1 + (CASE WHEN len - 4 <= 255 THEN 1 ELSE 5 END)
               + (CASE WHEN rng <= 255 THEN 1 ELSE 5 END) AS cmd
      FROM (
        SELECT len,
               (s - 1) - lag(s - 1 + len, 1, 0) OVER (ORDER BY s) + 1 AS rng
        FROM (
          SELECT count(*) AS len, min(rn) AS s
          FROM (
            SELECT {col} AS v, rn,
                   rn - row_number() OVER (PARTITION BY {col} ORDER BY rn) AS grp
            FROM (SELECT {col}, row_number()
                         OVER (ORDER BY l_orderkey, l_linenumber) AS rn
                  FROM lineitem)
          ) GROUP BY v, grp
          HAVING count(*) >= 5
        )
      )
    )"""


def _col_stats_sql(col: str) -> str:
    return f"""
    SELECT '{col}' AS col_name, s.n_values, s.vmin, s.vmax, s.n_distinct,
           r.n_runs
    FROM (
      SELECT CAST(count(*) AS BIGINT) AS n_runs FROM (
        SELECT 1
        FROM (SELECT v, rn - row_number() OVER (PARTITION BY v ORDER BY rn) AS grp
              FROM (SELECT {col} AS v,
                           row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
                    FROM lineitem))
        GROUP BY v, grp
      )) r
    CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n_values,
                 CAST(min({col}) AS BIGINT) AS vmin,
                 CAST(max({col}) AS BIGINT) AS vmax,
                 CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct
          FROM lineitem) s"""


_STAT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]

_BW = "(CASE WHEN {x} <= 0 THEN 0 ELSE length(bin({x})) END)"


def _codec_selection_sql() -> str:
    stats = " UNION ALL ".join(_col_stats_sql(c) for c in _STAT_COLS)
    bw_span = _BW.format(x="(vmax - vmin)")
    bw_k = _BW.format(x="(n_distinct - 1)")
    return f"""
    WITH stats AS ({stats}),
    ests AS (
      SELECT col_name,
             CAST(16 + 4 * n_values AS BIGINT) AS est_raw,
             CAST(17 + (n_values * {bw_span} + 7) // 8 AS BIGINT) AS est_for_bitpack,
             CAST(34 + (n_distinct * {bw_span} + 7) // 8
                     + (n_values * {bw_k} + 7) // 8 AS BIGINT) AS est_dict_bitpack
      FROM stats)
    SELECT col_name, est_raw, est_for_bitpack, est_dict_bitpack,
           CASE WHEN est_for_bitpack = least(est_raw, est_for_bitpack, est_dict_bitpack)
                  THEN 'for_bitpack'
                WHEN est_dict_bitpack = least(est_raw, est_for_bitpack, est_dict_bitpack)
                  THEN 'dict_bitpack'
                ELSE 'raw' END AS chosen_codec
    FROM ests ORDER BY col_name"""


def _stop_list(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in STOPWORDS[lang])


_TOKS_CTE = (
    "toks AS (SELECT doc_id, source, "
    "list_transform(string_split(text, ' '), "
    "w -> ('0x'||substr(md5(w),1,8))::BIGINT % 50257) AS ids "
    "FROM documents)"
)

_SIG_CTE = """
  ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
         WHERE len(string_split(text, ' ')) >= 3),
  sh AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
         FROM ws, unnest(generate_series(1, len(w) - 2)) AS g(i)),
  sig AS (SELECT doc_id,
            min(('0x'||substr(md5('0:' || shingle),1,8))::BIGINT) AS b0,
            min(('0x'||substr(md5('1:' || shingle),1,8))::BIGINT) AS b1,
            min(('0x'||substr(md5('2:' || shingle),1,8))::BIGINT) AS b2,
            min(('0x'||substr(md5('3:' || shingle),1,8))::BIGINT) AS b3
          FROM sh GROUP BY doc_id)
"""


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["run_stats_returnflag"] = f"""
      WITH runs AS ({_runs_cte('l_returnflag', 'lineitem',
                               'l_orderkey, l_linenumber')})
      SELECT value, CAST(count(*) AS BIGINT) AS n_runs,
             CAST(sum(run_len) AS BIGINT) AS total_len,
             CAST(max(run_len) AS BIGINT) AS max_run_len
      FROM runs GROUP BY value ORDER BY value"""

    sql["run_extract_orderstatus"] = f"""
      WITH runs AS ({_runs_cte('o_orderstatus', 'orders', 'o_orderkey')})
      SELECT CAST(s AS BIGINT) AS start_rn, value,
             CAST(run_len AS BIGINT) AS run_len
      FROM runs ORDER BY s"""

    sql["run_length_histogram"] = f"""
      WITH runs AS ({_runs_cte('l_returnflag', 'lineitem',
                               'l_orderkey, l_linenumber')})
      SELECT CAST(length(bin(run_len)) - 1 AS INT) AS bit_class,
             CAST(count(*) AS BIGINT) AS n_runs
      FROM runs GROUP BY 1 ORDER BY 1"""

    # full --analyze surface: width-2 aligned symbol runs, stride-2
    # unaligned (UNBOUND) runs, and LUT-motivating recurrence stats
    _SEQ_CTE = ("seq AS (SELECT l_returnflag AS ch, row_number() OVER "
                "(ORDER BY l_orderkey, l_linenumber) AS rn FROM lineitem)")

    def _width_hist_sql(w: int) -> str:
        return f"""
      WITH {_SEQ_CTE},
      syms AS (SELECT CAST((rn-1)//{w} AS BIGINT) AS sym_idx,
                      string_agg(ch, '' ORDER BY rn) AS sym,
                      count(*) AS nb
               FROM seq GROUP BY 1),
      c AS (SELECT sym_idx, sym FROM syms WHERE nb = {w}),
      runs AS (SELECT count(*) AS run_len FROM (
        SELECT sym, sym_idx - row_number()
               OVER (PARTITION BY sym ORDER BY sym_idx) AS grp
        FROM c) GROUP BY sym, grp)
      SELECT CAST(length(bin(run_len)) - 1 AS INT) AS bit_class,
             CAST(count(*) AS BIGINT) AS n_runs
      FROM runs GROUP BY 1 ORDER BY 1"""

    def _unaligned_hist_sql(w: int) -> str:
        return f"""
      WITH {_SEQ_CTE},
      eqt AS (SELECT rn, COALESCE(ch = lag(ch, {w}) OVER (ORDER BY rn),
                                  FALSE) AS eq FROM seq),
      runs AS (SELECT eq, count(*) AS len FROM (
        SELECT eq, rn - row_number()
               OVER (PARTITION BY eq ORDER BY rn) AS grp
        FROM eqt) GROUP BY eq, grp)
      SELECT CAST(length(bin(len + {w})) - 1 AS INT) AS bit_class,
             CAST(count(*) AS BIGINT) AS n_runs
      FROM runs WHERE eq GROUP BY 1 ORDER BY 1"""

    for _w in (2, 3, 4, 6, 8, 16):
        sql[f"width{_w}_run_histogram"] = _width_hist_sql(_w)
        sql[f"unaligned{_w}_run_histogram"] = _unaligned_hist_sql(_w)

    sql["exact_run_histogram"] = f"""
      WITH runs AS ({_runs_cte('l_returnflag', 'lineitem',
                               'l_orderkey, l_linenumber')})
      SELECT CAST(run_len AS INT) AS run_len,
             CAST(count(*) AS BIGINT) AS n_runs
      FROM runs WHERE run_len <= 64 GROUP BY 1 ORDER BY 1"""

    sql["lru_recurrence"] = """
      WITH runs AS (
        SELECT count(*) AS run_len, min(rn) AS s, v AS value FROM (
          SELECT o_orderstatus AS v, rn,
                 rn - row_number() OVER (PARTITION BY o_orderstatus
                                         ORDER BY rn) AS grp
          FROM (SELECT o_orderstatus,
                       row_number() OVER (ORDER BY o_orderkey) AS rn
                FROM orders)
        ) GROUP BY v, grp HAVING count(*) >= 3),
      o AS (SELECT value,
                   lag(value,1) OVER (ORDER BY s) AS p1,
                   lag(value,2) OVER (ORDER BY s) AS p2,
                   lag(value,3) OVER (ORDER BY s) AS p3,
                   lag(value,4) OVER (ORDER BY s) AS p4,
                   lag(value,5) OVER (ORDER BY s) AS p5,
                   lag(value,6) OVER (ORDER BY s) AS p6,
                   lag(value,7) OVER (ORDER BY s) AS p7
            FROM runs)
      SELECT CAST(1 AS INT) AS k,
             CAST(count(*) FILTER (WHERE value IN (p1)) AS BIGINT) AS n_hits,
             CAST(count(*) AS BIGINT) AS n_runs FROM o
      UNION ALL
      SELECT CAST(3 AS INT),
             CAST(count(*) FILTER (WHERE value IN (p1, p2, p3)) AS BIGINT),
             CAST(count(*) AS BIGINT) FROM o
      UNION ALL
      SELECT CAST(7 AS INT),
             CAST(count(*) FILTER (WHERE value IN (p1, p2, p3, p4, p5,
                                                   p6, p7)) AS BIGINT),
             CAST(count(*) AS BIGINT) FROM o
      ORDER BY k"""

    sql["ref_rle8_size"] = (_ref_rle8_sql("l_returnflag") + " UNION ALL "
                            + _ref_rle8_sql("l_linestatus")
                            + " ORDER BY col_name")

    sql["column_codec_stats"] = (" UNION ALL ".join(
        _col_stats_sql(c) for c in _STAT_COLS) + " ORDER BY col_name")

    sql["codec_selection"] = _codec_selection_sql()

    sql["tokenize_stats"] = f"""
      WITH {_TOKS_CTE}
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(ids)) AS BIGINT) AS total_tokens,
             CAST(sum(COALESCE(list_sum(ids), 0)) AS BIGINT) AS token_id_sum
      FROM toks GROUP BY source ORDER BY source"""

    sql["token_runs_by_source"] = f"""
      WITH {_TOKS_CTE},
      pairs AS (SELECT source, CASE WHEN t.ids[i] = t.ids[i+1] THEN 1 ELSE 0 END AS eq
                FROM toks t, unnest(generate_series(1, len(t.ids) - 1)) AS g(i))
      SELECT d.source,
             CAST(COALESCE((SELECT sum(eq) FROM pairs p WHERE p.source = d.source), 0)
                  AS BIGINT) AS adjacent_equal_pairs
      FROM (SELECT DISTINCT source FROM documents) d ORDER BY d.source"""

    sql["roundtrip_matches"] = """
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs_matched
      FROM documents GROUP BY source ORDER BY source"""

    # streaming path must deliver every doc exactly once, bit-identical:
    # the oracle is the plain per-source doc count
    sql["streaming_backfill"] = sql["roundtrip_matches"]

    from rle_spark.multimodal import ensure_asset_parquet
    asset_path = ensure_asset_parquet()
    sql["multimodal_features"] = f"""
      SELECT asset_id, modality,
             CAST(gt_n_bytes AS BIGINT) AS n_bytes,
             gt_md5 AS content_md5,
             gt_mean AS mean_level,
             gt_entropy AS byte_entropy
      FROM '{asset_path}' ORDER BY asset_id"""

    sql["dedup_exact"] = """
      SELECT md5(text) AS text_hash, CAST(count(*) AS BIGINT) AS n_dups
      FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY 1"""

    sql["minhash_signatures"] = f"""
      WITH {_SIG_CTE}
      SELECT doc_id, b0, b1, b2, b3 FROM sig ORDER BY doc_id"""

    # same df_cap=1000 stop-shingle guard as the Spark default: shingles
    # in more than 1000 docs are dropped on BOTH engines
    sql["ngram_jaccard_pairs"] = """
      WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
                  WHERE len(string_split(text, ' ')) >= 3),
      shd_all AS (SELECT DISTINCT doc_id,
                     w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
              FROM ws, unnest(generate_series(1, len(w) - 2)) AS g(i)),
      shd AS (SELECT * FROM shd_all
              WHERE shingle NOT IN (SELECT shingle FROM shd_all
                                    GROUP BY shingle
                                    HAVING count(*) > 1000)),
      counts AS (SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       count(*) AS n_inter
                FROM shd a JOIN shd b USING (shingle)
                WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
      SELECT doc_a, doc_b,
             CAST(FLOOR(100.0 * n_inter
                        / (ca.n_sh + cb.n_sh - n_inter)) AS BIGINT)
               AS jaccard_pct
      FROM inter
      JOIN counts ca ON ca.doc_id = doc_a
      JOIN counts cb ON cb.doc_id = doc_b
      WHERE FLOOR(100.0 * n_inter / (ca.n_sh + cb.n_sh - n_inter)) >= 20
      ORDER BY doc_a, doc_b"""

    from rle_spark.textops import simhash_oracle_sql
    sql["simhash"] = simhash_oracle_sql()

    sql["doc_fingerprint"] = """
      SELECT doc_id,
             list_min(list_transform(generate_series(1,
                 greatest(length(text) - 31, 1)),
                 i -> md5(substr(text, i, 32)))) AS fingerprint
      FROM documents ORDER BY doc_id"""

    from rle_spark.similarity import (NEAR_DUP_PLANES,
                                      cosine_near_dup_oracle_sql,
                                      ivf_oracle_sql, quantize_oracle_sql)

    # auto-derived plane counts: frozen from the oracle corpus row count
    # exactly the way the IVF oracle freezes its centroids; the Spark
    # queries compute them live from emb.count(). The fixture read is
    # env-overridable and guarded (round-3 advice): the frozen counts
    # come from whichever sf dir the correctness driver compares at.
    import pyarrow.parquet as _pq
    from rle_spark.similarity import auto_n_planes
    _nd_fixture = os.path.join(
        os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"),
        "embeddings.parquet")
    try:
        _nd_rows = _pq.ParquetFile(_nd_fixture).metadata.num_rows
    except OSError:
        _nd_rows = 500  # the sf0.01 corpus this oracle shipped against

    # default shape = auto grid at the library defaults (target 256,
    # floor NEAR_DUP_PLANES): resolves to the old pinned 6 at 500 rows
    sql["cosine_near_dup"] = cosine_near_dup_oracle_sql(
        n_planes=auto_n_planes(_nd_rows, 256, NEAR_DUP_PLANES))
    # fixed-grid regression shape
    sql["cosine_near_dup_pinned"] = cosine_near_dup_oracle_sql(
        n_planes=NEAR_DUP_PLANES)
    # aggressive auto grid whose plane count provably varies at sf0.01
    sql["cosine_near_dup_auto"] = cosine_near_dup_oracle_sql(
        n_planes=auto_n_planes(_nd_rows, Q.AUTO_ND_TARGET_BUCKET,
                               Q.AUTO_ND_MIN_PLANES))

    sql["embedding_quantize"] = quantize_oracle_sql()

    # IVF quantizer + query vector are frozen from the sf0.01 training
    # file on both sides; the query scans whichever sf is under test
    sql["ivf_topk"] = ivf_oracle_sql()

    sql["near_dup_buckets"] = f"""
      WITH {_SIG_CTE},
      ub AS (SELECT 0 AS band, b0 AS band_hash, doc_id FROM sig
             UNION ALL SELECT 1, b1, doc_id FROM sig
             UNION ALL SELECT 2, b2, doc_id FROM sig
             UNION ALL SELECT 3, b3, doc_id FROM sig)
      SELECT band, band_hash, CAST(count(*) AS BIGINT) AS n_docs
      FROM ub GROUP BY band, band_hash HAVING count(*) > 1
      ORDER BY band, band_hash"""

    sql["quality_by_source"] = """
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_words,
             CAST(sum(length(text)) AS BIGINT) AS total_chars,
             CAST(sum(length(text)
                  - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) AS BIGINT)
               AS total_punct,
             CAST(sum(len(list_filter(string_split(text, ' '),
                  x -> lower(x) IN ({en})))) AS BIGINT) AS total_stopwords_en
      FROM documents GROUP BY source ORDER BY source""".format(
        en=_stop_list("en"))

    sql["langid_counts"] = """
      WITH hits AS (
        SELECT len(list_filter(string_split(lower(text), ' '),
                   x -> x IN ({en}))) AS h_en,
               len(list_filter(string_split(lower(text), ' '),
                   x -> x IN ({es}))) AS h_es,
               len(list_filter(string_split(lower(text), ' '),
                   x -> x IN ({de}))) AS h_de,
               len(list_filter(string_split(lower(text), ' '),
                   x -> x IN ({fr}))) AS h_fr
        FROM documents),
      pred AS (
        SELECT CASE WHEN greatest(h_en, h_es, h_de, h_fr) <= 0 THEN 'und'
                    WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
                    WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
                    WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
                    ELSE 'fr' END AS lang_pred
        FROM hits)
      SELECT lang_pred, CAST(count(*) AS BIGINT) AS n_docs
      FROM pred GROUP BY lang_pred ORDER BY lang_pred""".format(
        en=_stop_list("en"), es=_stop_list("es"),
        de=_stop_list("de"), fr=_stop_list("fr"))

    sql["ann_topk"] = """
      SELECT vec_id,
             round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                   (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                    WHERE vec_id = 0)), 3) AS sim_r3
      FROM embeddings
      ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
               (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                WHERE vec_id = 0)) DESC,
               vec_id
      LIMIT 10"""

    sql["pricing_summary"] = """
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2))
               AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
               AS sum_base_price,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1 - l_discount AS DECIMAL(8,4))) AS DECIMAL(18,4))
               AS sum_disc_price,
             CAST(count(*) AS BIGINT) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""

    sql["revenue_by_nation"] = """
      SELECT n_name,
             CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
               AS revenue,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""

    return sql
