"""Production site-calling mode through the runner (VERDICT r4 item 1):
``run_alignment_batch(call_variants=...)`` computes per-site variant
marginals with DEVICE site sums (execute_site_marginals) on the Pallas
path and host pair-folds on the XLA path — both must reproduce the
host marginalizer (marginalize_full_variants,
reference src/signalalign/variantCaller.py:123-187) applied to the
full-output rows of a plain run of the SAME batch."""

import numpy as np
import pandas as pd
import pytest

from signalalign_tpu.io.guide import GuideAlignment
from signalalign_tpu.io.read import NanoporeReadData
from signalalign_tpu.io.reference import ProcessedReference
from signalalign_tpu.models.pore_model import PoreModel, ScalingParams
from signalalign_tpu.pipeline.runner import run_alignment_batch
from signalalign_tpu.pipeline.signal_align import AlignmentConfig
from signalalign_tpu.pipeline.variant_caller import (
    aggregate_over_reads, marginalize_full_variants)

MODEL = "/root/reference/models/testModelR9p4_5mer_acegt_template.model"


@pytest.fixture(scope="module")
def cpg_batch(tmp_path_factory):
    """8 synthetic reads over a CpG-dense Y-ambiguous reference (the
    same construction as the runner P=2 dispatch test)."""
    tmp_path = tmp_path_factory.mktemp("sitecall")
    model = PoreModel.from_file(MODEL)
    rng = np.random.default_rng(9)
    core = "".join(rng.choice(list("ACGT"), size=598))
    genome = ("ACGT" * 40 + core + "ACGT" * 40).replace("CG", "CGCG")
    fasta = tmp_path / "ref.fa"
    with open(fasta, "w") as fh:
        fh.write(">chr\n" + genome + "\n")
    reference = ProcessedReference(str(fasta), motifs=[("CG", "YG")])

    k = model.kmer_length
    rgs = []
    for ri in range(8):
        start = 40 + 17 * ri
        seq_len = 220
        read_seq = genome[start:start + seq_len]
        ids = model.alphabet.seq_to_kmer_ids(read_seq)
        events, event_map = [], []
        for kid in ids:
            event_map.append(len(events))
            events.append([rng.normal(model.level_mean[kid],
                                      model.level_sd[kid]),
                           1.0, .002, len(events) * .002])
        event_map.extend([event_map[-1]] * (k - 1))
        read = NanoporeReadData(
            read_label=f"p2r{ri}", template_read=read_seq,
            events=np.array(events), event_map=np.array(event_map),
            model_states=None, p_model_state=None, kmer_length=k,
            params=ScalingParams(), rna=False)
        guide = GuideAlignment(
            contig="chr", forward=True, window_start=start,
            window_end=start + seq_len, query_start=0, query_end=seq_len,
            ops=[(seq_len, "M")])
        rgs.append((read, guide))
    return reference, model, rgs


def _host_reference_calls(reference, model, rgs, cfg):
    """Golden: plain batch -> full rows -> host marginalizer."""
    base = run_alignment_batch(rgs, reference, model, cfg,
                               use_pallas=False)
    out = {}
    for r in base:
        rows = r.full_rows(model)
        df = marginalize_full_variants(rows, "CT", r.read_label,
                                       r.forward, ambig_char="Y")
        out[r.read_label] = df
    return out


def _assert_calls_match(got: pd.DataFrame, ref: pd.DataFrame, tol):
    gk = {(r["strand"], int(r["position"])): (r["C"], r["T"])
          for _, r in got.iterrows()}
    rk = {(r["strand"], int(r["position"])): (r["C"], r["T"])
          for _, r in ref.iterrows()}
    assert set(gk) == set(rk), (set(gk) ^ set(rk))
    for key in rk:
        assert abs(gk[key][0] - rk[key][0]) < tol, (key, gk[key], rk[key])
        assert abs(gk[key][1] - rk[key][1]) < tol
        assert abs(gk[key][0] + gk[key][1] - 1.0) < 1e-6
    # row ORDER mirrors MarginalizeFullVariants: t strand first,
    # positions ascending on '+' mapping
    pos = [int(p) for p in got["position"]]
    assert pos == sorted(pos)


def test_site_calling_xla_fold_matches_host_marginalizer(cpg_batch):
    reference, model, rgs = cpg_batch
    cfg = AlignmentConfig(ambig_map={"Y": "CT"})
    ref_calls = _host_reference_calls(reference, model, rgs, cfg)
    res = run_alignment_batch(rgs, reference, model, cfg,
                              use_pallas=False, call_variants="CT")
    assert len(res) == 8
    for r in res:
        assert r.aligned_pairs == []        # only calls, no pair stream
        # the XLA fold is numerically identical to the marginalizer
        _assert_calls_match(r.variant_calls, ref_calls[r.read_label],
                            tol=1e-9)


def test_site_calling_device_path_matches_host_marginalizer(cpg_batch,
                                                            capfd):
    reference, model, rgs = cpg_batch
    cfg = AlignmentConfig(ambig_map={"Y": "CT"})
    ref_calls = _host_reference_calls(reference, model, rgs, cfg)
    capfd.readouterr()
    res = run_alignment_batch(rgs, reference, model, cfg,
                              use_pallas=True, pallas_interpret=True,
                              verbose=True, call_variants="CT")
    err = capfd.readouterr().err
    assert "pallas fallback" not in err, err    # device path MUST run
    assert len(res) == 8
    for r in res:
        assert r.aligned_pairs == []
        # device u16 posterior stack vs u8 pair bytes: sub-percent
        _assert_calls_match(r.variant_calls, ref_calls[r.read_label],
                            tol=0.02)
    # and the across-read aggregation consumes the frames directly
    agg = aggregate_over_reads([r.variant_calls for r in res], "CT")
    assert len(agg) > 10
    assert np.allclose(agg["C"] + agg["T"], 1.0)


@pytest.mark.slow
def test_run_signal_align_variants_output(tmp_path, ecoli_fasta):
    """CLI-level production calling: output_format='variants' writes the
    per-read marginalize_full_variants tables + the across-read
    aggregate (reference flow runSignalAlign -> variantCaller)."""
    import os

    from signalalign_tpu.pipeline.runner import run_signal_align

    oned = "/root/reference/tests/minion_test_reads/1D"
    model = PoreModel.from_file(MODEL)
    written = run_signal_align(
        alignment_file=os.path.join(oned, "1D.bam"),
        readdb=os.path.join(oned, "1D.fastq.index.readdb"),
        fast5_dirs=[oned], reference_fasta=ecoli_fasta, model=model,
        output_dir=str(tmp_path),
        config=AlignmentConfig(ambig_map={"Y": "CT"}),
        output_format="variants", motifs=[("CG", "YG")], max_reads=1,
        verbose=False)
    per_read = [w for w in written if w.endswith(".sm.variants.tsv")]
    agg = [w for w in written if w.endswith("variants_aggregate.tsv")]
    assert len(per_read) == 1 and len(agg) == 1
    # per-read per-strand summary (MarginalizeFullVariants
    # per_read_calls): mean of per-position probs + site count
    prc = pd.read_csv([w for w in written
                       if w.endswith("variants_per_read.tsv")][0],
                      sep="\t")
    assert list(prc.columns) == ["read_name", "contig", "strand",
                                 "forward_mapped", "n_sites", "C", "T"]
    assert len(prc) >= 1 and int(prc["n_sites"].iloc[0]) > 10
    df = pd.read_csv(per_read[0], sep="\t")
    assert list(df.columns) == ["read_name", "contig", "position",
                                "strand", "forward_mapped", "C", "T"]
    assert len(df) > 50
    assert np.allclose(df["C"] + df["T"], 1.0)
    adf = pd.read_csv(agg[0], sep="\t")
    assert len(adf) == len(set(df["position"]))
