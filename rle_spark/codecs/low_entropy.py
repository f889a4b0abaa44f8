"""True Low Entropy pre-transform (family F7) — the reference format's
distinctive pieces, re-expressed struct-of-arrays.

Reference semantics (/root/reference/src/rle8_low_entropy_cpu.c):
  * a 256-bit ELIGIBILITY BITMAP of symbols worth run-length coding,
    chosen by the cost heuristic "average run length >= 2"
    (:298-302) — symbols below it stay verbatim so the histogram the
    downstream entropy coder sees is undisturbed;
  * the body keeps every literal byte and, after an eligible byte,
    one count byte for the remaining repeats (:474-543), runs longer
    than a byte's range splitting into multiple segments;
  * the stream is built FOR an entropy coder, not instead of one.

Deviation (documented): the reference interleaves count bytes inline
(decodable only serially); we put the same count bytes in a separate
section so decode is one vectorized np.repeat — same byte accounting,
same eligibility heuristic, entropy-coder-friendlier layout (separate
streams have lower cross-entropy than the interleave). The reference
encodes counts through its symbol-probability ranking
(symbolsByProb[runLen], :474-543) for the same reason. Downstream
coder is zlib (public, in-container), as for the other F7 analogues.

Layout (pack_sections, zlib-composed by the registry wrapper):
  [0] eligibility bitmap (32 bytes, bit s = symbol s eligible)
  [1] data bytes: literals verbatim; each eligible-run segment as ONE
      symbol byte
  [2] count bytes: one per eligible-run segment, value = repeats - 1
      beyond the segment's symbol byte (0..255 -> segment covers
      1..256 occurrences)
"""

from __future__ import annotations

import numpy as np

from .base import find_runs, pack_sections, unpack_sections

_SEG_MAX = 256  # occurrences one count byte can cover (count = occ - 1)


def low_entropy_eligibility(vals: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Bitmap of symbols whose AVERAGE run length >= 2 — the reference
    cost heuristic (/root/reference/src/rle8_low_entropy_cpu.c:298-302):
    a count byte per run only pays off when runs average 2+ bytes."""
    total = np.zeros(256, dtype=np.int64)
    count = np.zeros(256, dtype=np.int64)
    np.add.at(total, vals, lens)
    np.add.at(count, vals, 1)
    return (count > 0) & (total >= 2 * count)


def low_entropy_single_eligibility(vals: np.ndarray,
                                   lens: np.ndarray) -> np.ndarray:
    """The `only_max_frequency` ("single") restriction of F7's grid
    (/root/reference/src/rle8_low_entropy_cpu.c:340-439): among symbols
    whose average run length clears the cost heuristic, ONLY the one
    with the maximum estimated byte savings (total bytes minus ~2 bytes
    per run for symbol+count) is run-length coded; everything else
    stays verbatim for the entropy coder. Deviation (documented):
    savings are estimated per run rather than per 255-byte segment —
    same argmax on every corpus whose runs fit one count byte."""
    total = np.zeros(256, dtype=np.int64)
    count = np.zeros(256, dtype=np.int64)
    np.add.at(total, vals, lens)
    np.add.at(count, vals, 1)
    cand = (count > 0) & (total >= 2 * count)
    savings = np.where(cand, total - 2 * count, 0)
    elig = np.zeros(256, dtype=bool)
    if savings.max(initial=0) > 0:
        elig[int(savings.argmax())] = True
    return elig


def low_entropy_encode_bytes(img: np.ndarray, single: bool = False) -> bytes:
    """single=True applies the only_max_frequency eligibility; the
    bitmap-driven decoder is shared by both variants."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if len(img) == 0:
        return pack_sections([b"\x00" * 32, b"", b""])
    starts, lens = find_runs(img)
    vals = img[starts]
    elig = (low_entropy_single_eligibility(vals, lens) if single
            else low_entropy_eligibility(vals, lens))
    is_e = elig[vals]
    # eligible runs split into ceil(L/256) segments of one symbol byte
    # + one count byte each; ineligible runs stay verbatim
    n_segs = np.where(is_e, (lens + _SEG_MAX - 1) // _SEG_MAX, 0)
    out_lens = np.where(is_e, n_segs, lens)
    data = np.repeat(vals, out_lens)
    k = int(n_segs.sum())
    counts = np.full(k, _SEG_MAX - 1, dtype=np.uint8)
    if k:
        seg_end = np.cumsum(n_segs[is_e]) - 1
        rem = lens[is_e] - (n_segs[is_e] - 1) * _SEG_MAX
        counts[seg_end] = (rem - 1).astype(np.uint8)
    bitmap = np.packbits(elig, bitorder="little").tobytes()
    return pack_sections([bitmap, data.tobytes(), counts.tobytes()])


def low_entropy_decode_bytes(buf: bytes | memoryview) -> np.ndarray:
    s = unpack_sections(buf)
    elig = np.unpackbits(np.frombuffer(s[0], dtype=np.uint8),
                         bitorder="little").astype(bool)
    data = np.frombuffer(s[1], dtype=np.uint8)
    counts = np.frombuffer(s[2], dtype=np.uint8)
    reps = np.ones(len(data), dtype=np.int64)
    m = elig[data]
    reps[m] = counts.astype(np.int64) + 1
    return np.repeat(data, reps)
