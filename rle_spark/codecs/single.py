"""Single-symbol RLE (family F3).

Reference semantics: pick ONE most-profitable symbol for the whole
block and RLE only runs of that symbol; the command stream then drops
the symbol field entirely. Selection heuristic is the reference's
run-aware savings argmax `saved = total_run_len - 2*run_count`
(/root/reference/src/rle8_extreme_cpu.c:53-153, esp. :135-152); the
chosen symbol is carried in the header like the reference's
`rle8_extreme_t.symbol` (/root/reference/src/rle8_extreme_cpu.h:359-370).

Our format (struct-of-arrays, like rle.py but with no run_values
stream):
  [0] header      — pack_ints([chosen_symbol])
  [1] run_lens    — pack_ints
  [2] lit_lens    — pack_ints (k+1 spans)
  [3] lit_values  — pack_ints
"""

from __future__ import annotations

import numpy as np

from .base import (
    fill_runs,
    find_runs,
    inner_offsets,
    pack_ints,
    pack_sections,
    scatter_segments,
    unpack_ints,
    unpack_sections,
)


def choose_symbol(sym: np.ndarray) -> int | None:
    """Argmax-savings symbol per the reference heuristic; None if no
    symbol has positive savings."""
    starts, lens = find_runs(sym)
    vals = sym[starts]
    runnable = lens >= 2
    if not runnable.any():
        return None
    v = vals[runnable].astype(np.int64)
    ln = lens[runnable]
    uniq, inv = np.unique(v, return_inverse=True)
    total_len = np.bincount(inv, weights=ln.astype(np.float64))
    count = np.bincount(inv)
    savings = total_len - 2.0 * count
    best = int(np.argmax(savings))
    if savings[best] <= 0:
        return None
    return int(uniq[best])


def single_encode_symbols(sym: np.ndarray, min_run: int = 2,
                          symbol: int | None = None) -> bytes | None:
    """Encode runs of one chosen symbol only; everything else literal.

    Returns None when no profitable symbol exists (caller falls back)."""
    if symbol is None:
        symbol = choose_symbol(sym)
        if symbol is None:
            return None
    n = len(sym)
    starts, lens = find_runs(sym)
    vals = sym[starts].astype(np.int64) if len(starts) else sym[:0].astype(np.int64)
    keep = (vals == np.int64(symbol)) & (lens >= min_run)
    run_starts = starts[keep]
    run_lens = lens[keep]
    lit_starts = np.concatenate(([0], run_starts + run_lens))
    lit_ends = np.concatenate((run_starts, [n]))
    lit_lens = (lit_ends - lit_starts).astype(np.int64)
    if lit_lens.sum():
        pos = np.repeat(lit_starts, lit_lens) + inner_offsets(lit_lens)
        lit_values = sym[pos]
    else:
        lit_values = sym[:0]
    return pack_sections([
        pack_ints(np.array([symbol], dtype=np.int64)),
        pack_ints(run_lens),
        pack_ints(lit_lens),
        pack_ints(lit_values),
    ])


def single_decode_symbols(buf: bytes | memoryview, dtype) -> np.ndarray:
    s = unpack_sections(buf)
    symbol = int(unpack_ints(s[0])[0])
    run_lens = unpack_ints(s[1])
    lit_lens = unpack_ints(s[2])
    # int32 targets assemble in int32 directly: the O(n) literal stream
    # is emitted at 4 B/elem and the final converting copy disappears
    # (values fit dtype by construction — they were encoded from it)
    dt = np.dtype(dtype)
    work = np.int32 if dt == np.int32 else np.int64
    lit_values = unpack_ints(s[3], out_dtype=work)
    k = len(run_lens)
    seg = np.empty(2 * k + 1, dtype=np.int64)
    seg[0::2] = lit_lens
    seg[1::2] = run_lens
    starts = np.cumsum(seg) - seg
    out = np.empty(int(seg.sum()), dtype=work)
    scatter_segments(out, starts[0::2], lit_lens, lit_values)
    fill_runs(out, starts[1::2], run_lens,
              np.full(k, symbol, dtype=work))
    return out.astype(dt, copy=False)
