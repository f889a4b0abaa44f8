"""FSST-lite: escape-coded digram substitution over byte images.

FSST (Boncz/Neumann/Leis, "FSST: Fast Random Access String
Compression", VLDB 2020 — see PAPERS.md) replaces frequent substrings
(len 1..8) with 1-byte codes plus an escape byte for uncovered input.
This implementation keeps the code+escape architecture but caps symbol
length at 2 (digrams), which is the part of the scheme that admits a
fully vectorized NumPy encoder:

  * table: top <=254 most frequent adjacent byte pairs (codes 0..253)
  * output byte = code (table hit) | ESCAPE(255) + literal byte
  * greedy non-overlapping matching, vectorized with the parity trick:
    within each maximal run of consecutive candidate match starts the
    greedy left-to-right choice is exactly the even offsets.

The reference repo has no FSST (north-rule extra); the closest
in-reference precedent is the tiny recent-symbols dictionary of the
n-Sym-LUT family (/root/reference/src/rleX_Xsl.h:130-188).

Payload sections: [0] table (2 bytes per digram), [1] code stream,
[2] u64 original length.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import pack_sections, unpack_sections

ESCAPE = 255
MAX_TABLE = 254
MIN_PAIR_COUNT = 4


def build_table(img: np.ndarray) -> np.ndarray:
    """Top frequent adjacent pairs as a (k, 2) uint8 array, k<=254."""
    if len(img) < 2:
        return np.zeros((0, 2), dtype=np.uint8)
    pairs = img[:-1].astype(np.uint16) << np.uint16(8)
    pairs |= img[1:]
    counts = np.bincount(pairs, minlength=65536)
    order = np.argsort(counts)[::-1][:MAX_TABLE]
    order = order[counts[order] >= MIN_PAIR_COUNT]
    table = np.empty((len(order), 2), dtype=np.uint8)
    table[:, 0] = order >> 8
    table[:, 1] = order & 255
    return table


def fsst_encode_bytes(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    n = len(img)
    table = build_table(img)
    k = len(table)
    if k == 0 or n < 8:
        # degenerate: pure escape stream would inflate 2x — store raw
        return pack_sections([b"", img.tobytes(), struct.pack("<Q", n)])
    pair_code = np.full(65536, 255, dtype=np.uint8)  # 255 = no code
    keys = table[:, 0].astype(np.uint16) << np.uint16(8)
    keys |= table[:, 1]
    pair_code[keys] = np.arange(k, dtype=np.uint8)
    pairs = img[:-1].astype(np.uint16) << np.uint16(8)
    pairs |= img[1:]
    cand = pair_code[pairs] != 255  # candidate match starts, len n-1
    # greedy non-overlap via parity-within-candidate-run
    idx = np.flatnonzero(cand)
    if len(idx):
        run_head = np.empty(len(idx), dtype=np.int64)
        new_run = np.empty(len(idx), dtype=bool)
        new_run[0] = True
        new_run[1:] = np.diff(idx) > 1
        # also break runs on parity reset: head of each maximal run
        heads = idx[new_run]
        run_id = np.cumsum(new_run) - 1
        run_head = heads[run_id]
        chosen = idx[((idx - run_head) % 2) == 0]
    else:
        chosen = idx
    is_match_start = np.zeros(n, dtype=bool)
    is_match_start[chosen] = True
    consumed_second = np.zeros(n + 1, dtype=bool)
    consumed_second[chosen + 1] = True
    literal = ~is_match_start & ~consumed_second[:n]
    # output stream: per input position that emits something:
    #   match start -> 1 byte (code); literal -> 2 bytes (ESC, byte)
    emit_pos = np.flatnonzero(is_match_start | literal)
    emit_is_match = is_match_start[emit_pos]
    out_lens = np.where(emit_is_match, 1, 2).astype(np.int64)
    out_starts = np.cumsum(out_lens) - out_lens
    out = np.empty(int(out_lens.sum()), dtype=np.uint8)
    m = emit_pos[emit_is_match]
    out[out_starts[emit_is_match]] = pair_code[pairs[m]] if len(m) else 0
    lit_pos = emit_pos[~emit_is_match]
    ls = out_starts[~emit_is_match]
    out[ls] = ESCAPE
    out[ls + 1] = img[lit_pos]
    return pack_sections([table.tobytes(), out.tobytes(), struct.pack("<Q", n)])


def fsst_decode_bytes(buf: bytes | memoryview) -> np.ndarray:
    s = unpack_sections(buf)
    table = np.frombuffer(s[0], dtype=np.uint8).reshape(-1, 2)
    stream = np.frombuffer(s[1], dtype=np.uint8)
    (n,) = struct.unpack("<Q", bytes(s[2]))
    if len(table) == 0:
        return stream[:n].copy()
    # classify stream positions: escape marker, escaped literal, code
    is_escape = np.zeros(len(stream), dtype=bool)
    # an ESCAPE byte is a marker only if not itself escaped; escapes
    # never nest ambiguously because markers always consume exactly the
    # next byte. Compute marker positions via run parity over ESC runs.
    esc = stream == ESCAPE
    idx = np.flatnonzero(esc)
    if len(idx):
        new_run = np.empty(len(idx), dtype=bool)
        new_run[0] = True
        new_run[1:] = np.diff(idx) > 1
        heads = idx[new_run]
        run_id = np.cumsum(new_run) - 1
        run_head = heads[run_id]
        markers = idx[((idx - run_head) % 2) == 0]
        # a marker is only real if the previous position isn't a marker
        # consuming it — handled by parity since marker+payload pairs.
        is_escape[markers] = True
    consumed = np.zeros(len(stream) + 1, dtype=bool)
    consumed[np.flatnonzero(is_escape) + 1] = True
    is_code = ~is_escape & ~consumed[: len(stream)]
    emit_pos = np.flatnonzero(is_escape | is_code)
    emit_is_code = is_code[emit_pos]
    seg_lens = np.where(emit_is_code, 2, 1).astype(np.int64)
    seg_starts = np.cumsum(seg_lens) - seg_lens
    out = np.empty(int(seg_lens.sum()), dtype=np.uint8)
    codes = stream[emit_pos[emit_is_code]]
    cs = seg_starts[emit_is_code]
    out[cs] = table[codes, 0]
    out[cs + 1] = table[codes, 1]
    es = seg_starts[~emit_is_code]
    out[es] = stream[emit_pos[~emit_is_code] + 1]
    if len(out) != n:
        raise ValueError(f"fsst decode length mismatch: {len(out)} != {n}")
    return out
