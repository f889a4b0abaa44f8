"""Port of the reference fuzzer's structured input generator.

Mirrors /root/reference/src/rle_fuzz.c: inputs are sequences of
sections, each either random bytes or a repeating k-byte symbol
(k in 1..16, aligned or not, from a fixed per-seed symbol pool —
:13-44, :360-438), with section lengths swept over three regimes:
small 1..280, medium 768..8192, and the u16 boundary 65528..65560
(:30-39). We generate int32 TOKEN arrays with the same section
structure (the engine's unit of encoding), plus byte-image cases via
the token LE image.
"""

from __future__ import annotations

import numpy as np

SYMBOL_LENS = [1, 2, 3, 4, 6, 8, 16]  # rle_fuzz.c:291-296
LEN_REGIMES = [(1, 280), (768, 8192), (65528, 65560)]  # rle_fuzz.c:30-39


def fuzz_tokens(seed: int, n_sections: int = 6, vocab: int = 2**31 - 2,
                regime: int | None = None) -> np.ndarray:
    rng = np.random.default_rng(seed)
    pool = rng.integers(0, vocab, 16)  # 16 fixed symbols (rle_fuzz.c:13-44)
    parts = []
    for s in range(n_sections):
        lo, hi = LEN_REGIMES[int(rng.integers(0, 3)) if regime is None else regime]
        length = int(rng.integers(lo, hi + 1))
        if rng.random() < 0.5:
            parts.append(rng.integers(0, vocab, length))
        else:
            k = int(rng.choice(SYMBOL_LENS))
            sym = rng.choice(pool, k)
            reps = length // k + 1
            parts.append(np.tile(sym, reps)[:length])
    return np.concatenate(parts).astype(np.int32) if parts else np.zeros(0, np.int32)


def boundary_cases() -> dict[str, np.ndarray]:
    """FIXTURES.md edge-case checklist: run lengths at the exact
    min-range/count-escape boundaries of the reference formats."""
    rng = np.random.default_rng(7)
    cases = {
        "empty": np.zeros(0, np.int32),
        "one": np.array([42], np.int32),
        "all_same": np.full(10_000, 7, np.int32),
        "alternating": np.tile(np.array([3, 9], np.int32), 5000),
        "int32_edges": np.array([-2**31, 2**31 - 1, 0, -1, 1] * 7, np.int32),
        "incompressible": rng.integers(0, 2**31 - 1, 20_000).astype(np.int32),
    }
    parts = []
    for run_len in (1, 2, 3, 4, 5, 6, 127, 128, 255, 256, 65535, 65536, 65537):
        parts.append(np.full(run_len, run_len % 97, np.int32))
        parts.append(rng.integers(0, 1000, 3).astype(np.int32))
    cases["escape_boundaries"] = np.concatenate(parts)
    return cases
