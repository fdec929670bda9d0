"""Dependency-free guide-alignment generation (bwa mem stand-in).

reference: utils/bwaWrapper.py generateGuideAlignment — the upstream shells
out to `bwa mem` to map the nucleotide read and converts the record to an
exonerate-style guide alignment. Here a native Smith-Waterman with affine
gaps (csrc sa_sw_align) aligns the read against each contig in both
orientations and the best local hit becomes the GuideAlignment. Intended
for the reference's test-scale use case (plasmid/amplicon references, 2D
reads without BAMs); genome-scale guide alignments should come from a
provided BAM as in the reference pipeline.
"""

from __future__ import annotations

import ctypes
from typing import List, Optional, Tuple

import numpy as np

from signalalign_tpu.io.guide import GuideAlignment
from signalalign_tpu.utils import native
from signalalign_tpu.utils.alphabet import reverse_complement

_OP_CHARS = "MID"


def _sw(query: str, ref: str) -> Optional[Tuple[float, int, int, int, int,
                                                List[Tuple[int, str]]]]:
    lib = native._load()
    if lib is None:
        return _sw_py(query, ref)
    max_ops = 4 * (len(query) + len(ref)) + 16
    ops = np.zeros(max_ops, dtype=np.int32)
    lens = np.zeros(max_ops, dtype=np.int64)
    qs = ctypes.c_long()
    qe = ctypes.c_long()
    rs = ctypes.c_long()
    re_ = ctypes.c_long()
    nops = ctypes.c_long()
    score = ctypes.c_double()
    rc = lib.sa_sw_align(
        query.encode(), ctypes.c_long(len(query)),
        ref.encode(), ctypes.c_long(len(ref)),
        ctypes.c_double(2.0), ctypes.c_double(-3.0),
        ctypes.c_double(-5.0), ctypes.c_double(-2.0),
        ctypes.byref(qs), ctypes.byref(qe), ctypes.byref(rs),
        ctypes.byref(re_),
        ops.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        ctypes.c_long(max_ops), ctypes.byref(nops), ctypes.byref(score))
    if rc != 0:
        return None
    cigar = [(int(lens[i]), _OP_CHARS[int(ops[i])])
             for i in range(nops.value)]
    return (score.value, qs.value, qe.value, rs.value, re_.value, cigar)


def _sw_py(query: str, ref: str):
    """Anti-diagonal-free numpy fallback (linear gaps; row-scan)."""
    lq, lr = len(query), len(ref)
    q = np.frombuffer(query.encode(), dtype=np.uint8)
    r = np.frombuffer(ref.encode(), dtype=np.uint8)
    H = np.zeros((lq + 1, lr + 1), dtype=np.float32)
    for i in range(1, lq + 1):
        sub = np.where(r == q[i - 1], 2.0, -3.0).astype(np.float32)
        row = np.maximum(H[i - 1, :-1] + sub, H[i - 1, 1:] - 4.0)
        # left-gap via running max (approximate: one pass)
        prev = 0.0
        out = np.empty(lr, dtype=np.float32)
        for j in range(lr):
            v = max(row[j], prev - 4.0, 0.0)
            out[j] = v
            prev = v
        H[i, 1:] = out
    bi, bj = np.unravel_index(np.argmax(H), H.shape)
    best = float(H[bi, bj])
    if best <= 0:
        return None
    # greedy traceback
    i, j = int(bi), int(bj)
    ops: List[Tuple[int, str]] = []

    def push(op):
        if ops and ops[-1][1] == op:
            ops[-1] = (ops[-1][0] + 1, op)
        else:
            ops.append((1, op))

    while i > 0 and j > 0 and H[i, j] > 0:
        sub = 2.0 if query[i - 1] == ref[j - 1] else -3.0
        if abs(H[i, j] - (H[i - 1, j - 1] + sub)) < 1e-4:
            push("M")
            i -= 1
            j -= 1
        elif abs(H[i, j] - (H[i, j - 1] - 4.0)) < 1e-4:
            push("D")
            j -= 1
        else:
            push("I")
            i -= 1
    ops.reverse()
    return (best, i, int(bi), j, int(bj), ops)


def generate_guide_alignment(read_seq: str, reference,
                             contig: Optional[str] = None,
                             min_score: float = 50.0
                             ) -> Optional[GuideAlignment]:
    """Best local hit of ``read_seq`` against a ProcessedReference.

    Tries every contig (or just ``contig``) in both orientations; query
    coordinates of the returned guide are in the original read, ops in
    target orientation (the frame guide_from_sam_record produces).
    """
    names = [contig] if contig else list(reference.forward.keys())
    best = None
    for name in names:
        fwd = reference.forward[name]
        for is_fwd, target in ((True, fwd), (False, reverse_complement(fwd))):
            hit = _sw(read_seq, target)
            if hit is None:
                continue
            score, qs, qe, rs, re_, cigar = hit
            if best is None or score > best[0]:
                best = (score, name, is_fwd, qs, qe, rs, re_, cigar,
                        len(fwd))
    if best is None or best[0] < min_score:
        return None
    score, name, is_fwd, qs, qe, rs, re_, cigar, lref = best
    if is_fwd:
        window_start, window_end = rs, re_
    else:
        # coordinates were on the reverse-complement strand
        window_start, window_end = lref - re_, lref - rs
    return GuideAlignment(
        contig=name, forward=is_fwd,
        window_start=window_start, window_end=window_end,
        query_start=qs, query_end=qe, ops=cigar)
