"""Deterministic token-sequence fixtures (FIXTURES.md T1) and the
tokenized-documents derivation used by __spark_entry__.py.

The synthetic generator is a Spark-level port of the reference
fuzzer's input structure (/root/reference/src/rle_fuzz.c:360-438):
each doc's token array is a concatenation of sections that are either
random tokens or a repeating k-gram (k in {1,2,3,4,8} mirroring the
fuzzer's symbol lengths, :291-296), with section lengths swept over
the fuzzer's three regimes (:30-39) so the count-escape boundaries
get exercised at the Spark level too.

Determinism: every doc is generated from a PCG64 seeded by
(global_seed, doc index) — independent of partitioning, so the same
(sf, seed) always yields bit-identical tables, which is what makes
the resume/idempotency tests meaningful.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TOKEN_SCHEMA_DDL = "doc_id string, tokens array<int>, n_tok int, source string"

SOURCES = [
    # name, weight (doc share), vocab, length profile
    ("web", 0.55, 50257, "short"),
    ("code", 0.20, 32000, "medium"),
    ("books", 0.02, 50257, "long"),     # few docs, 100-1000x longer: skew
    ("synth_rle", 0.13, 256, "medium"),  # highly runnable
    ("synth_rand", 0.10, 2**31 - 2, "medium"),  # incompressible -> RAW
]

_LEN_PROFILE = {"short": (16, 512), "medium": (256, 4096), "long": (65000, 262144)}


def _doc_tokens(rng: np.random.Generator, source: str, vocab: int,
                lo: int, hi: int) -> np.ndarray:
    n_target = int(rng.integers(lo, hi))
    parts = []
    total = 0
    runnable = source in ("synth_rle", "books", "code")
    while total < n_target:
        section = int(rng.integers(0, 3))
        remaining = n_target - total
        if source == "synth_rand":
            # FIXTURES.md: incompressible control source -> RAW must win
            parts.append(rng.integers(0, vocab, remaining))
            total += remaining
            continue
        if section == 0 or (runnable and section == 1):
            # repeating k-gram (fuzzer repeating-symbol section)
            k = int(rng.choice([1, 1, 2, 3, 4, 8]))
            reps = int(min(rng.integers(2, 400), max(remaining // k, 1)))
            gram = rng.integers(0, vocab, k)
            parts.append(np.tile(gram, reps))
            total += k * reps
        else:
            ln = int(min(rng.integers(1, 280) if rng.random() < 0.7
                         else rng.integers(768, 8192), remaining))
            parts.append(rng.integers(0, vocab, ln))
            total += ln
    out = np.concatenate(parts)[:n_target] if parts else np.zeros(0)
    return out.astype(np.int32)


def generate_docs_pandas(indices, seed: int = 42) -> pd.DataFrame:
    """Generate docs for the given global indices. Deterministic per
    (seed, index) regardless of partitioning."""
    weights = np.array([w for _, w, _, _ in SOURCES])
    weights = weights / weights.sum()
    rows_id, rows_tok, rows_n, rows_src = [], [], [], []
    for i in (int(x) for x in indices):
        rng = np.random.default_rng([seed, i])
        src_i = int(rng.choice(len(SOURCES), p=weights))
        name, _, vocab, profile = SOURCES[src_i]
        lo, hi = _LEN_PROFILE[profile]
        toks = _doc_tokens(rng, name, vocab, lo, hi)
        rows_id.append(f"{name}-{i:012d}")
        rows_tok.append(toks)
        rows_n.append(len(toks))
        rows_src.append(name)
    return pd.DataFrame({
        "doc_id": rows_id, "tokens": rows_tok,
        "n_tok": np.array(rows_n, dtype=np.int32), "source": rows_src,
    })


def token_table(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Distributed deterministic token table: spark.range drives the
    per-doc generator inside mapInPandas (generation scales with the
    cluster; no driver-side materialization)."""
    partitions = partitions or max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            if len(idx) == 0:
                continue
            yield generate_docs_pandas(idx, seed)

    return (spark.range(0, n_docs, numPartitions=partitions)
            .mapInPandas(gen, TOKEN_SCHEMA_DDL))
