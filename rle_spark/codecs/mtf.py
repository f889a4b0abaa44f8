"""Lane-parallel move-to-front transform (family F9: mmtf128/mmtf256).

Reference semantics: N independent byte lanes, each running a
depth-256 move-to-front — 16 lanes for mmtf128
(/root/reference/src/mmtf.c:112-178), 32 lanes for mmtf256. The
transform is size-preserving (ratio 100%) and exists to make the
downstream codec's job easier (README.md:270-272) — here it feeds the
hybrid RLE / bit-pack streams (the rle8_mmtf128 composition, family
F10, /root/reference/src/rle8_mmtf.c:242-374).

Vectorization: MTF is sequential in time, so like the reference we
vectorize ACROSS lanes (/root/reference/src/mmtf.c:114-117 does 16
lanes per SIMD step). We keep a (lanes, 256) rank table R where
R[l, s] = current MTF rank of symbol s in lane l; one time step is
three whole-array ops. Cost is O(256 * n_bytes / 1) total work, so the
selector only tries MTF when block stats suggest a win — same
reasoning as the reference making MMTF an opt-in transform rather
than a default.
"""

from __future__ import annotations

import numpy as np


def mtf_encode_bytes(img: np.ndarray, lanes: int = 16) -> np.ndarray:
    """Forward lane-MTF over a uint8 byte image. Tail bytes beyond a
    multiple of `lanes` are passed through untransformed (the reference
    copies the unaligned tail verbatim too).

    Run-skip: a time step whose symbols all equal the previous step's
    emits all-zero ranks and leaves every rank table untouched, so the
    Python loop only visits CHANGE steps. On run-heavy data (where MTF
    is worth trying at all) that cuts iterations by the mean run
    length; worst case degrades to the old per-step loop."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    n = len(img)
    steps = n // lanes
    body = img[: steps * lanes].reshape(steps, lanes)
    out = np.zeros_like(body)
    if steps:
        active = np.empty(steps, dtype=bool)
        active[0] = True
        np.any(body[1:] != body[:-1], axis=1, out=active[1:])
        change_steps = np.flatnonzero(active)
    else:
        change_steps = np.zeros(0, dtype=np.int64)
    ranks = np.tile(np.arange(256, dtype=np.uint8), (lanes, 1))
    lane_idx = np.arange(lanes)
    for t in change_steps:
        s = body[t]
        r = ranks[lane_idx, s]
        out[t] = r
        ranks += ranks < r[:, None]
        ranks[lane_idx, s] = 0
    return np.concatenate([out.ravel(), img[steps * lanes:]])


def mtf_decode_bytes(enc: np.ndarray, lanes: int = 16) -> np.ndarray:
    """Inverse lane-MTF. Maintains the explicit MTF list T[l, rank]=sym.

    Run-skip mirror of the encoder: an all-zero rank row decodes to the
    current front symbols (= the previous decoded row) with no table
    update, so only non-zero rows run the Python step; skipped rows are
    filled by a vectorized forward-fill afterwards."""
    enc = np.ascontiguousarray(enc, dtype=np.uint8)
    n = len(enc)
    steps = n // lanes
    body = enc[: steps * lanes].reshape(steps, lanes)
    out = np.empty_like(body)
    if steps:
        active = np.empty(steps, dtype=bool)
        active[0] = True
        np.any(body[1:] != 0, axis=1, out=active[1:])
        change_steps = np.flatnonzero(active)
    else:
        active = np.zeros(0, dtype=bool)
        change_steps = np.zeros(0, dtype=np.int64)
    table = np.tile(np.arange(256, dtype=np.uint8), (lanes, 1))
    lane_idx = np.arange(lanes)
    rank_row = np.arange(256, dtype=np.int64)[None, :]
    shifted = np.empty_like(table)
    for t in change_steps:
        r = body[t]
        s = table[lane_idx, r]
        out[t] = s
        shifted[:, 1:] = table[:, :-1]
        shifted[:, 0] = 0
        move = (rank_row > 0) & (rank_row <= r[:, None].astype(np.int64))
        table = np.where(move, shifted, table)
        table[lane_idx, 0] = s
    if steps:
        # forward-fill skipped rows from the last active row
        src = np.maximum.accumulate(np.where(active, np.arange(steps), 0))
        out = out[src]
    return np.concatenate([out.ravel(), enc[steps * lanes:]])


# ---------------------------------------------------------------------------
# bit-plane MMTF (bitmmtf8/16) — the depth-2 MTF degenerate case
# ---------------------------------------------------------------------------
#
# Reference semantics (/root/reference/src/bit_mmtf.c:18-60 encode,
# :64-128 decode): each of the 8 bit planes runs an independent 2-symbol
# MTF, which reduces to XOR against the previous byte's same plane —
# out[i] = in[i] ^ in[i - stride] with stride 1 (bitmmtf8) or 2
# (bitmmtf16; the reference processes byte pairs and copies a trailing
# odd byte verbatim, matching cut below). Size-preserving; turns runs
# into zero bytes for the downstream RLE.


def bitmmtf_encode_bytes(img: np.ndarray, stride: int = 1) -> np.ndarray:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    n = len(img)
    cut = (n // stride) * stride
    out = img.copy()
    out[stride:cut] ^= img[: cut - stride]
    return out


def bitmmtf_decode_bytes(enc: np.ndarray, stride: int = 1) -> np.ndarray:
    enc = np.ascontiguousarray(enc, dtype=np.uint8)
    n = len(enc)
    cut = (n // stride) * stride
    out = enc.copy()
    if cut:
        lanes = out[:cut].reshape(-1, stride)
        np.bitwise_xor.accumulate(lanes, axis=0, out=lanes)
    return out
