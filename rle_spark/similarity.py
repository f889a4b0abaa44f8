"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — exact baseline; JVM-side arithmetic
    via F.zip_with + F.aggregate (no Python in the hot path).
  * LSH-bucketed ANN — random-hyperplane signatures restrict the
    candidate set to matching buckets; the scale path (candidate
    generation is a hash-partition join on the bucket key, so work is
    proportional to bucket sizes, not N^2).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"),
                              lambda acc, v: acc + v * v))


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector.

    The per-row dot product is a codegen'd expression; top-k is a
    global sort limit (Spark runs it as a per-partition TakeOrdered +
    driver merge — no full shuffle)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))
    return (emb.select(F.col(id_col), sim.alias("cosine_sim"))
            .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
            .limit(k))


def hyperplane_signatures(emb: DataFrame, n_planes: int = 16, seed: int = 7,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    """Random-hyperplane LSH signature (one int bucket per row).

    sign(v . h_p) per plane packed into an int — cosine-similar vectors
    collide with high probability. Planes are deterministic from the
    seed so signatures are reproducible."""
    dim = len(emb.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        h = F.array(*[F.lit(float(x)) for x in planes[p]])
        bit = F.when(_dot(F.col(vec_col), h) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        sig = sig.bitwiseOR(bit)
    return emb.select(F.col(id_col), F.col(vec_col), sig.alias("bucket"))


def ann_topk_lsh(emb: DataFrame, query_vec: list[float], k: int = 10,
                 n_planes: int = 8, seed: int = 7,
                 vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: brute-force cosine restricted to the query's
    LSH bucket. Recall grows with fewer planes / multiple tables; this
    single-table variant is the benchmark shape."""
    sigs = hyperplane_signatures(emb, n_planes, seed, vec_col, id_col)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, len(query_vec)))
    qsig = 0
    qv = np.asarray(query_vec, dtype=np.float64)
    for p in range(n_planes):
        if float(planes[p] @ qv) > 0:
            qsig |= 1 << p
    cand = sigs.filter(F.col("bucket") == qsig)
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


# ---------------------------------------------------------------------------
# pairwise near-duplicate detection (embedding-cosine)
# ---------------------------------------------------------------------------
#
# The SQL-oracle contract needs bit-identical floats between Spark and
# DuckDB, so the signature/cosine expressions are generated as explicit
# left-associated term sums evaluated in DOUBLE on both engines (same
# fold order -> same rounding), with plane constants rounded to 6
# decimals (decimal literals parse to identical doubles everywhere).

NEAR_DUP_PLANES = 6
NEAR_DUP_SEED = 7
NEAR_DUP_DIM = 64
NEAR_DUP_MIN_PCT = 30


def near_dup_plane_matrix(n_planes: int = NEAR_DUP_PLANES,
                          dim: int = NEAR_DUP_DIM,
                          seed: int = NEAR_DUP_SEED) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6)


def _sum_terms(terms: list[str]) -> str:
    return "(" + " + ".join(terms) + ")"


def dot_expr_sql(pa: str, pb: str, dim: int, base: int) -> str:
    """dot(pa, pb) as an explicit term sum; base=0 (Spark) / 1 (DuckDB)."""
    return _sum_terms([
        f"CAST({pa}[{i + base}] AS DOUBLE) * CAST({pb}[{i + base}] AS DOUBLE)"
        for i in range(dim)])


def signature_expr_sql(prefix: str, planes: np.ndarray, base: int) -> str:
    """Packed sign-bit hyperplane signature as a SQL expression."""
    bits = []
    for j, plane in enumerate(planes):
        dot = _sum_terms([
            f"CAST({prefix}[{i + base}] AS DOUBLE) * {plane[i]!r}"
            for i in range(len(plane))])
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return _sum_terms(bits)


def cos_pct_expr_sql(pa: str, pb: str, dim: int, base: int) -> str:
    return (f"CAST(FLOOR(100.0 * {dot_expr_sql(pa, pb, dim, base)} / "
            f"(SQRT({dot_expr_sql(pa, pa, dim, base)}) * "
            f"SQRT({dot_expr_sql(pb, pb, dim, base)}))) AS BIGINT)")


def cosine_near_dup(emb: DataFrame, min_pct: int = NEAR_DUP_MIN_PCT,
                    n_planes: int = NEAR_DUP_PLANES,
                    seed: int = NEAR_DUP_SEED, dim: int = NEAR_DUP_DIM,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """Near-duplicate embedding pairs: same LSH bucket AND exact cosine
    >= min_pct/100. Candidate generation is a hash join on the bucket
    key (work ~ sum of squared bucket sizes, not N^2); the exact
    cosine runs only on candidates. Multiple tables (seeds) raise
    recall the standard way; one table is the benchmark shape."""
    planes = near_dup_plane_matrix(n_planes, dim, seed)
    sig = emb.select(F.col(id_col).alias("vec_id"),
                     F.col(vec_col).alias("embedding"),
                     F.expr(signature_expr_sql(vec_col, planes, 0))
                     .alias("sig"))
    a, b = sig.alias("a"), sig.alias("b")
    pairs = (a.join(b, (F.col("a.sig") == F.col("b.sig"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")))
             .select(F.col("a.vec_id").alias("vec_a"),
                     F.col("b.vec_id").alias("vec_b"),
                     F.expr(cos_pct_expr_sql("a.embedding", "b.embedding",
                                             dim, 0)).alias("cos_pct")))
    return pairs.filter(F.col("cos_pct") >= min_pct)


def cosine_near_dup_oracle_sql(min_pct: int = NEAR_DUP_MIN_PCT,
                               n_planes: int = NEAR_DUP_PLANES,
                               seed: int = NEAR_DUP_SEED,
                               dim: int = NEAR_DUP_DIM) -> str:
    """DuckDB equivalent of cosine_near_dup over the embeddings view."""
    planes = near_dup_plane_matrix(n_planes, dim, seed)
    sig_sql = signature_expr_sql("embedding", planes, 1)
    cos_sql = cos_pct_expr_sql("a.embedding", "b.embedding", dim, 1)
    return f"""
      WITH sig AS (SELECT vec_id, embedding, {sig_sql} AS sig
                   FROM embeddings)
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos_sql} AS cos_pct
      FROM sig a JOIN sig b ON a.sig = b.sig AND a.vec_id < b.vec_id
      WHERE {cos_sql} >= {min_pct}
      ORDER BY vec_a, vec_b"""
