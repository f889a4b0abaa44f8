"""Dictionary encoding (north-rule extra; no reference counterpart —
closest in-reference precedent is the n-Sym-LUT recent-symbols cache,
/root/reference/src/rleX_Xsl.h:134-188, which is a 1/3/7-entry
dictionary).

Format: sorted unique values, delta-coded then frame-of-reference
bit-packed; codes bit-packed at ceil(log2(k)) bits via pack_ints.
Sections: [0] dict deltas, [1] codes.
"""

from __future__ import annotations

import numpy as np

from .base import pack_ints, pack_sections, unpack_ints, unpack_sections


def dict_encode(arr: np.ndarray) -> bytes:
    a = np.ascontiguousarray(arr, dtype=np.int64)
    uniq, inv = np.unique(a, return_inverse=True)
    deltas = np.diff(uniq, prepend=uniq[:1]) if len(uniq) else uniq
    if len(uniq):
        deltas = deltas.copy()
        deltas[0] = uniq[0]
    return pack_sections([pack_ints(deltas), pack_ints(inv)])


def dict_decode(buf: bytes | memoryview, dtype=np.int64) -> np.ndarray:
    s = unpack_sections(buf)
    uniq = np.cumsum(unpack_ints(s[0]))
    codes = unpack_ints(s[1])
    if len(uniq) == 0:
        return np.zeros(0, dtype=dtype)
    out = uniq[codes]
    return out.astype(dtype, copy=False) if np.dtype(dtype) != np.int64 else out
