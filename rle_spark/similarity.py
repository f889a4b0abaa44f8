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
