"""RNA m6A variant calling end-to-end: A->X ambiguity positions with the
X -> {A,F} degenerate model (signalMachine -o 5), validated against the
shipped RNA variant golden (tests/test_variantCalled_files/rna) whose
coordinate frame matches ours exactly."""

import os

import numpy as np
import pandas as pd
import pytest

from signalalign_tpu.io.guide import guide_from_sam_record
from signalalign_tpu.io.read import NanoporeReadData
from signalalign_tpu.io.reference import (AmbiguityPositions,
                                          ProcessedReference)
from signalalign_tpu.io.sam import filter_reads
from signalalign_tpu.models.pore_model import PoreModel
from signalalign_tpu.pipeline import signal_align as sa
from signalalign_tpu.pipeline.variant_caller import marginalize_full_variants

RNA_DIR = "/root/reference/tests/minion_test_reads/RNA_edge_cases"
RNA_REF = "/root/reference/tests/test_sequences/fake_rna_ref.fa"
POSITIONS = ("/root/reference/tests/test_position_files/"
             "rna_atg_ftg_fake_ref.positions")
MODEL = "/root/reference/models/testModelR9p4_5mer_acfgt_RNA.model"
GOLDEN = ("/root/reference/tests/test_variantCalled_files/rna/"
          "7d31de25-8c15-46d8-a08c-3d5043258c89.sm.forward.tsv")

GOLD_COLS = ["contig", "ref", "kmer", "read", "strand", "ev", "evmean",
             "evnoise", "evdur", "alnkmer", "scaledE", "scaledN", "p",
             "descaled", "Emean", "pathkmer"]


@pytest.fixture(scope="module")
def aligned(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rnavc")
    # the shipped positions substitute A->F; the golden run used the X
    # ambiguity form of the same sites
    xpos = tmp / "positions.tsv"
    with open(POSITIONS) as src, open(xpos, "w") as dst:
        for line in src:
            parts = line.split()
            if len(parts) >= 5:
                dst.write("\t".join(parts[:4] + ["X"]) + "\n")
    positions = AmbiguityPositions.from_file(str(xpos))
    reference = ProcessedReference(RNA_REF, positions=positions)
    model = PoreModel.from_file(MODEL)
    pairs = filter_reads(os.path.join(RNA_DIR, "rna_reads.bam"),
                         os.path.join(RNA_DIR, "rna_reads.readdb"), [RNA_DIR])
    f5, rec = [p for p in pairs if p[1].qname.startswith("7d31de25")][0]
    read = NanoporeReadData.from_fast5(f5)
    guide = guide_from_sam_record(rec)
    ambig = dict(sa.AlignmentConfig().ambig_map)
    ambig["X"] = "AF"   # degenerate option 5 (A/F), signalMachine.c:21
    config = sa.AlignmentConfig(ambig_map=ambig)
    result = sa.align_read(read, guide, reference, model, config)
    return result, model


def test_x_sites_expand_to_af(aligned):
    result, model = aligned
    rows = result.full_rows(model)
    xrows = [r for r in rows if "X" in r.aligned_kmer]
    assert xrows
    called = {r.path_kmer[r.aligned_kmer.index("X")] for r in xrows
              if "X" in r.aligned_kmer}
    assert called <= {"A", "F"} and len(called) == 2


def test_frame_matches_golden(aligned):
    """The golden run shares our output frame (contig rna_fake, genomic
    positions); per-position posterior-weighted descaled currents agree."""
    result, model = aligned
    rows = result.full_rows(model)
    mine = pd.DataFrame(
        [(r.reference_index, r.reference_kmer, r.posterior_probability,
          r.descaled_event_mean) for r in rows],
        columns=["ref", "kmer", "p", "descaled"])
    gold = pd.read_csv(GOLDEN, sep="\t", names=GOLD_COLS,
                       keep_default_na=False)
    gk = gold.groupby("ref").kmer.first()
    mk = mine.groupby("ref").kmer.first()
    shared = gk.index.intersection(mk.index)
    assert len(shared) > 450
    assert (gk[shared] == mk[shared]).all()

    def weighted(df):
        df = df[df.p > 0.2]
        return df.groupby("ref").apply(
            lambda d: (d.descaled * d.p).sum() / d.p.sum(),
            include_groups=False)

    j = pd.concat([weighted(gold), weighted(mine)], axis=1,
                  keys=["g", "m"]).dropna()
    assert j.m.corr(j.g) > 0.95


def test_rna_variant_marginals_equivalence(aligned):
    """Our marginalizer on the GOLDEN rows reproduces the reference
    algorithm; our own rows produce normalized A/F marginals at the same
    sites."""
    result, model = aligned
    gold = pd.read_csv(GOLDEN, sep="\t", names=GOLD_COLS,
                       keep_default_na=False)
    # reference algorithm on golden rows (variantCaller.py:124-180, k=5)
    k1 = 4
    ref_sites = {}
    gv = gold[[("X" in k) for k in gold.kmer]]
    for pos in sorted(set(gv.ref)):
        pdta = gv[gv.ref == pos]
        if pdta.alnkmer.iloc[0][k1] != "X":
            continue
        probs = {n: pdta[[k[k1] == n for k in pdta.pathkmer]].p.sum()
                 for n in "AF"}
        tot = sum(probs.values())
        if tot > 0:
            ref_sites[pos] = probs["F"] / tot
    assert ref_sites

    rows = result.full_rows(model)
    mine = marginalize_full_variants(rows, "AF", "r", result.forward)
    msites = {int(r["position"]): r["F"] for _, r in mine.iterrows()
              if r["strand"] == "t"}
    shared = set(ref_sites) & set(msites)
    # same site set modulo band-edge effects
    assert len(shared) >= 0.8 * len(ref_sites)
    # the shipped acfgt test model carries F rows identical to A, so both
    # the golden and our marginals sit at ~0.5 by construction; assert that
    # agreement rather than direction
    for p_ in shared:
        assert abs(ref_sites[p_] - 0.5) < 0.05
        assert abs(msites[p_] - 0.5) < 0.05
