"""Posterior-weight multiple sequence alignment.

Re-design of the reference's ``impl/multipleAligner.c``: all (or
spanning-tree-selected) pairwise posterior alignments between sequence
fragments become weighted edges between single-position columns; columns
are then merged greedily by descending average weight, with a
partial-order (poset) consistency check so the final columns admit a
valid alignment order (getMultipleSequenceAlignment,
multipleAligner.c:272-299; stPosetAlignment in the reference's sonLib).

The poset check is realized as a column DAG: every column carries
within-sequence successor edges (position i -> i+1); merging two columns
is legal iff neither reaches the other (merging would otherwise create a
cycle = a crossing alignment) and no sequence contributes two positions
to the merged column. The final MSA is a topological sort of columns.

The pairwise aligner is the discrete 3-state pair HMM
(models/discrete_hmm.py), with gap-gamma reweighting
(reweightAlignedPairs2) and the normalized average-posterior alignment
score (getAlignmentScore, multipleAligner.c:604-619).
"""

from __future__ import annotations

import heapq
import itertools
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from ..models.discrete_hmm import DiscreteHmm

__all__ = ["MultipleAlignment", "make_alignment",
           "make_all_pairwise_alignments", "alignment_score", "render_msa"]


def alignment_score(pairs, len1: int, len2: int) -> float:
    """Normalized average posterior that a position of the shorter
    sequence is aligned (multipleAligner.c:604-619); in [0, 1]."""
    total = sum(p for p, _, _ in pairs)
    j = max(min(len1, len2), 1)
    return float(np.clip(total / j, 0.0, 1.0))


def reweight_aligned_pairs(pairs, len1: int, len2: int,
                           gap_gamma: float):
    """Scale posteriors down by gap_gamma * per-position gap posterior
    (reweightAlignedPairs2): pair (p, i, j) is reweighted by
    p - gap_gamma * (gapX(i) + gapY(j)) where gap(i) = 1 - sum of match
    posteriors at i."""
    if gap_gamma <= 0.0:
        return list(pairs)
    gx = np.ones(len1)
    gy = np.ones(len2)
    for p, i, j in pairs:
        gx[i] -= p
        gy[j] -= p
    out = []
    for p, i, j in pairs:
        w = p - gap_gamma * (max(gx[i], 0.0) + max(gy[j], 0.0))
        out.append((w, i, j))
    return out


# ---------------------------------------------------------------------------
# column poset
# ---------------------------------------------------------------------------

class _ColumnSet:
    """Union-find over (seq, pos) positions + a column DAG for the poset
    consistency check (the stPosetAlignment role)."""

    def __init__(self, lengths: Sequence[int]):
        self.lengths = list(lengths)
        self.parent: Dict[Tuple[int, int], Tuple[int, int]] = {}
        # members per root column
        self.members: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
        for s, L in enumerate(lengths):
            for p in range(L):
                self.parent[(s, p)] = (s, p)
                self.members[(s, p)] = [(s, p)]

    def find(self, key):
        root = key
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[key] != root:
            self.parent[key], key = root, self.parent[key]
        return root

    def _succs(self, root) -> Set[Tuple[int, int]]:
        out = set()
        for s, p in self.members[root]:
            if p + 1 < self.lengths[s]:
                out.add(self.find((s, p + 1)))
        return out

    def reaches(self, a, b) -> bool:
        """DFS along successor edges: does column a precede column b?"""
        stack = [a]
        seen = {a}
        while stack:
            c = stack.pop()
            for n in self._succs(c):
                if n == b:
                    return True
                if n not in seen:
                    seen.add(n)
                    stack.append(n)
        return False

    def can_merge(self, a, b) -> bool:
        a, b = self.find(a), self.find(b)
        if a == b:
            return False
        seqs_a = {s for s, _ in self.members[a]}
        if any(s in seqs_a for s, _ in self.members[b]):
            return False
        return not (self.reaches(a, b) or self.reaches(b, a))

    def merge(self, a, b):
        a, b = self.find(a), self.find(b)
        if len(self.members[a]) < len(self.members[b]):
            a, b = b, a
        self.parent[b] = a
        self.members[a].extend(self.members.pop(b))
        return a

    def columns(self) -> List[List[Tuple[int, int]]]:
        """Topologically-ordered columns (Kahn over successor edges)."""
        roots = [r for r in self.members]
        indeg = {r: 0 for r in roots}
        succs = {r: self._succs(r) for r in roots}
        for r in roots:
            for n in succs[r]:
                indeg[n] += 1
        # deterministic tie-break: earliest (seq, pos) member
        ready = [(min(self.members[r]), r) for r in roots if indeg[r] == 0]
        heapq.heapify(ready)
        out = []
        while ready:
            _, r = heapq.heappop(ready)
            out.append(sorted(self.members[r]))
            for n in succs[r]:
                indeg[n] -= 1
                if indeg[n] == 0:
                    heapq.heappush(ready, (min(self.members[n]), n))
        assert len(out) == len(roots), "column DAG has a cycle"
        return out


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

@dataclass
class MultipleAlignment:
    """Columns + the pairwise evidence that produced them
    (struct MultipleAlignment, multipleAligner.h)."""
    columns: List[List[Tuple[int, int]]]
    aligned_pairs: List[Tuple[float, int, int, int, int]]
    pairwise_scores: Dict[Tuple[int, int], float] = field(
        default_factory=dict)


def make_all_pairwise_alignments(seqs: Sequence[str],
                                 hmm: Optional[DiscreteHmm] = None,
                                 gap_gamma: float = 0.5,
                                 threshold: float = 0.01):
    """(weight, seq1, pos1, seq2, pos2) tuples for every sequence pair
    (makeAllPairwiseAlignments, multipleAligner.c:674-688)."""
    hmm = hmm or DiscreteHmm()
    multiple_pairs = []
    scores = {}
    for s1, s2 in itertools.combinations(range(len(seqs)), 2):
        pairs = hmm.aligned_pairs(seqs[s1], seqs[s2], threshold=threshold)
        weighted = reweight_aligned_pairs(pairs, len(seqs[s1]),
                                          len(seqs[s2]), gap_gamma)
        # score the gap-gamma-reweighted pairs (the reference computes
        # getAlignmentScore after reweighting, multipleAligner.c:667-668)
        scores[(s1, s2)] = alignment_score(weighted, len(seqs[s1]),
                                           len(seqs[s2]))
        for w, i, j in weighted:
            if w > 0.0:
                multiple_pairs.append((w, s1, i, s2, j))
    return multiple_pairs, scores


def make_alignment(seqs: Sequence[str],
                   hmm: Optional[DiscreteHmm] = None,
                   match_gamma: float = 0.0,
                   gap_gamma: float = 0.5,
                   threshold: float = 0.01) -> MultipleAlignment:
    """Greedy posterior-weight MSA (makeAlignment /
    getMultipleSequenceAlignment): merge the highest-average-weight
    column pair while legal and avgWeight >= match_gamma."""
    pairs, scores = make_all_pairwise_alignments(
        seqs, hmm=hmm, gap_gamma=gap_gamma, threshold=threshold)
    cols = _ColumnSet([len(s) for s in seqs])

    # edge weights between root columns: sum + count -> average
    acc: Dict[Tuple, List[float]] = {}
    for w, s1, i, s2, j in pairs:
        key = ((s1, i), (s2, j))
        e = acc.setdefault(key, [0.0, 0.0])
        e[0] += w
        e[1] += 1.0
    heap = [(-e[0] / e[1], a, b) for (a, b), e in acc.items()]
    heapq.heapify(heap)
    # greedy merge with lazy deletion: position-pair edges are consumed
    # highest-average-weight first. (The reference re-averages the merged
    # columns' remaining edges on each merge; consuming the original
    # edges in weight order is an equivalent-threshold greedy that keeps
    # this pure-host path simple.)
    while heap:
        negw, a, b = heapq.heappop(heap)
        w = -negw
        if w < match_gamma:
            break
        ra, rb = cols.find(a), cols.find(b)
        if ra == rb:
            continue
        if not cols.can_merge(ra, rb):
            continue
        cols.merge(ra, rb)
    return MultipleAlignment(columns=cols.columns(), aligned_pairs=pairs,
                             pairwise_scores=scores)


def render_msa(seqs: Sequence[str],
               alignment: MultipleAlignment) -> List[str]:
    """Gapped alignment strings, one per input sequence."""
    n = len(seqs)
    rows = [[] for _ in range(n)]
    for col in alignment.columns:
        present = dict(col)
        for s in range(n):
            rows[s].append(seqs[s][present[s]] if s in present else "-")
    return ["".join(r) for r in rows]
