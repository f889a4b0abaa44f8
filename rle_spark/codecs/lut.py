"""Recent-symbols (LUT) RLE variant — family F4 (n-Sym-LUT).

Reference semantics: the encoder keeps a small cache of the last 1/3/7
distinct RLE symbols and emits a short LUT index instead of the full
symbol on a hit (/root/reference/src/rleX_Xsl.h:130-188, LRU update
:134-188). Our SoA re-expression: run values are recency-coded as the
distance (in runs) to their previous occurrence; distances 1..7 are
"LUT hits" stored in 3 bits, misses carry the explicit value. Decode
resolves the reference chain value[i] = value[i - D[i]] by vectorized
pointer jumping (log n gather rounds), keeping the zero-per-element
discipline.

Payload sections: [run_lens][lit_lens][lit_values][hit_flags]
[hit_distances][miss_values].
"""

from __future__ import annotations

import numpy as np

from .base import (
    fill_runs,
    pack_bits,
    pack_ints,
    pack_sections,
    scatter_segments,
    unpack_bits,
    unpack_ints,
    unpack_sections,
)
from .rle import split_runs_literals, DEFAULT_MIN_RUN

LUT_WINDOW = 7  # default tier; the reference grid is 1/3/7
                # (/root/reference/src/rleX_Xsl.c:7-175 instantiates all
                # three; the window is an encode-side knob here — decode
                # reads stored distances and never needs it)


def _prev_occurrence(values: np.ndarray) -> np.ndarray:
    """prev[i] = largest j<i with values[j]==values[i], else -1
    (vectorized via stable group sort)."""
    n = len(values)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    _, inv = np.unique(values, return_inverse=True)
    order = np.argsort(inv, kind="stable")
    prev_sorted = np.full(n, -1, dtype=np.int64)
    same = inv[order][1:] == inv[order][:-1]
    prev_sorted[1:][same] = order[:-1][same]
    prev = np.empty(n, dtype=np.int64)
    prev[order] = prev_sorted
    return prev


def lut_encode_symbols(sym: np.ndarray,
                       min_run: int = DEFAULT_MIN_RUN,
                       window: int = LUT_WINDOW) -> bytes:
    _, run_lens, run_values, lit_lens, lit_values = split_runs_literals(
        sym, min_run)
    rv = run_values.astype(np.int64, copy=False)
    k = len(rv)
    prev = _prev_occurrence(rv)
    dist = np.arange(k, dtype=np.int64) - prev
    hit = (prev >= 0) & (dist <= window)
    return pack_sections([
        pack_ints(run_lens),
        pack_ints(lit_lens),
        pack_ints(lit_values),
        pack_bits(hit.astype(np.uint64), 1) if k else b"",
        pack_ints(dist[hit]),
        pack_ints(rv[~hit]),
    ])


def lut_decode_symbols(buf: bytes | memoryview, dtype) -> np.ndarray:
    s = unpack_sections(buf)
    run_lens = unpack_ints(s[0])
    lit_lens = unpack_ints(s[1])
    lit_values = unpack_ints(
        s[2], out_dtype=np.int32 if np.dtype(dtype) == np.int32 else None)
    k = len(run_lens)
    if k:
        hit = unpack_bits(s[3], 1, k).astype(bool)
        dist = unpack_ints(s[4])
        miss_values = unpack_ints(s[5])
        # resolve value[i] = value[i - dist] chains by pointer jumping
        idx = np.arange(k, dtype=np.int64)
        parent = idx.copy()
        parent[hit] = idx[hit] - dist
        while True:
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
        base = np.zeros(k, dtype=np.int64)
        base[~hit] = miss_values
        run_values = base[parent]
    else:
        run_values = np.zeros(0, dtype=np.int64)
    seg = np.empty(2 * k + 1, dtype=np.int64)
    seg[0::2] = lit_lens
    seg[1::2] = run_lens
    starts = np.cumsum(seg) - seg
    # int32 targets assemble in int32 directly (fancy-index stores
    # cast); run_values stay int64 — the chain resolution above is O(k)
    dt = np.dtype(dtype)
    out = np.empty(int(seg.sum()),
                   dtype=np.int32 if dt == np.int32 else np.int64)
    scatter_segments(out, starts[0::2], lit_lens, lit_values)
    fill_runs(out, starts[1::2], run_lens, run_values)
    return out.astype(dt, copy=False)
