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
    copies the unaligned tail verbatim too)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    n = len(img)
    steps = n // lanes
    body = img[: steps * lanes].reshape(steps, lanes)
    out = np.empty_like(body)
    ranks = np.tile(np.arange(256, dtype=np.uint8), (lanes, 1))
    lane_idx = np.arange(lanes)
    for t in range(steps):
        s = body[t]
        r = ranks[lane_idx, s]
        out[t] = r
        ranks += ranks < r[:, None]
        ranks[lane_idx, s] = 0
    return np.concatenate([out.ravel(), img[steps * lanes:]])


def mtf_decode_bytes(enc: np.ndarray, lanes: int = 16) -> np.ndarray:
    """Inverse lane-MTF. Maintains the explicit MTF list T[l, rank]=sym."""
    enc = np.ascontiguousarray(enc, dtype=np.uint8)
    n = len(enc)
    steps = n // lanes
    body = enc[: steps * lanes].reshape(steps, lanes)
    out = np.empty_like(body)
    table = np.tile(np.arange(256, dtype=np.uint8), (lanes, 1))
    lane_idx = np.arange(lanes)
    rank_row = np.arange(256, dtype=np.int64)[None, :]
    for t in range(steps):
        r = body[t]
        s = table[lane_idx, r]
        out[t] = s
        shifted = np.empty_like(table)
        shifted[:, 1:] = table[:, :-1]
        shifted[:, 0] = 0
        move = (rank_row > 0) & (rank_row <= r[:, None].astype(np.int64))
        table = np.where(move, shifted, table)
        table[lane_idx, 0] = s
    return np.concatenate([out.ravel(), enc[steps * lanes:]])
