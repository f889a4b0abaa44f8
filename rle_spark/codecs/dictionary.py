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


_DENSE_SPAN = 1 << 20


def _unique_inverse(a: np.ndarray):
    """np.unique(return_inverse) with an O(n + span) dense fast path
    for narrow value ranges (token vocabularies), avoiding the
    O(n log n) sort."""
    if len(a) == 0:
        return a, np.zeros(0, dtype=np.int64)
    lo = int(a.min())
    span = int(a.max()) - lo + 1
    if 0 < span <= _DENSE_SPAN:
        offs = (a - lo).astype(np.int64)
        present = np.zeros(span, dtype=bool)
        present[offs] = True
        uniq_off = np.flatnonzero(present)
        rank = np.empty(span, dtype=np.int64)
        rank[uniq_off] = np.arange(len(uniq_off))
        return uniq_off + lo, rank[offs]
    try:
        # wide spans: pandas' hash-based factorize is ~1.8x numpy's
        # sort-based unique on high-vocab blocks; sort the (small)
        # dict table after and remap the codes so the output — sorted
        # uniques + ranks — is identical to np.unique(return_inverse)
        import pandas as pd
        codes, uniq_seen = pd.factorize(a, sort=False)
        order = np.argsort(uniq_seen, kind="stable")
        remap = np.empty(len(order), dtype=np.int64)
        remap[order] = np.arange(len(order))
        return uniq_seen[order], remap[codes]
    except ImportError:
        return np.unique(a, return_inverse=True)


def dict_encode(arr: np.ndarray) -> bytes:
    # keep the source dtype through the O(n) unique/inverse pass (the
    # int64 promotion was a full extra pass); only the SMALL dict
    # table is widened for the exact delta math below
    a = np.ascontiguousarray(arr)
    uniq, inv = _unique_inverse(a)
    uniq = uniq.astype(np.int64, copy=False)
    deltas = np.diff(uniq, prepend=uniq[:1]) if len(uniq) else uniq
    if len(uniq):
        deltas = deltas.copy()
        deltas[0] = uniq[0]
    return pack_sections([pack_ints(deltas), pack_ints(inv)])


def dict_decode(buf: bytes | memoryview, dtype=np.int64) -> np.ndarray:
    s = unpack_sections(buf)
    uniq = np.cumsum(unpack_ints(s[0]))
    # codes are in [0, |dict|) so the int32 emission always engages;
    # downcasting the small dict table before the O(n) gather makes the
    # output materialize at the target width directly
    codes = unpack_ints(s[1], out_dtype=np.int32)
    if len(uniq) == 0:
        return np.zeros(0, dtype=dtype)
    dt = np.dtype(dtype)
    if dt != np.int64:
        uniq = uniq.astype(dt, copy=False)
    return uniq[codes]
