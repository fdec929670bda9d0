"""Device banded forward-backward vs the float64 oracle."""

import math
import os

import numpy as np
import pytest

from signalalign_tpu.models.pore_model import PoreModel, ScalingParams
from signalalign_tpu.ops import banded_fb as bfb
from signalalign_tpu.ops.fb_oracle import (CellPaths, Emissions,
                                           banded_forward_backward)
from signalalign_tpu.utils.alphabet import DEFAULT_AMBIG_BASES

MODELS = "/root/reference/models"

SX = "ACGATALGGACAT"
EVENTS = np.array([
    [58.743435, 0.887833, 0.0571, 0.0],
    [53.604965, 0.816836, 0.0571, 0.1],
    [58.432015, 0.735143, 0.0571, 0.2],
    [63.684352, 0.795437, 0.0571, 0.3],
    [58.921430, 0.812959, 0.0571, 0.4],
    [59.895882, 0.740952, 0.0571, 0.5],
    [61.684303, 0.722332, 0.0571, 0.67],
])


@pytest.fixture(scope="module")
def r73_model():
    return PoreModel.from_file(os.path.join(MODELS, "testModelR73_acegot_template.model"))


@pytest.fixture(scope="module")
def r94_model():
    return PoreModel.from_file(os.path.join(MODELS, "testModelR9p4_acegt_template.model"))


def test_golden_case_matches_oracle(r73_model):
    model = r73_model
    params = ScalingParams()
    problem = bfb.prepare_problem(
        SX, EVENTS, model, params, DEFAULT_AMBIG_BASES,
        W=16, Dpad=24, P=3, mode=bfb.MODE_FULL,
        anchor_pairs=(), expansion=2,
        ragged_start=False, ragged_end=False)
    res = bfb.run_banded_fb(problem, W=16, P=3, with_expectations=True)

    paths = CellPaths.from_sequence(SX, model, DEFAULT_AMBIG_BASES)
    em = Emissions(model, params, mode="full")
    oracle = banded_forward_backward(
        paths, EVENTS, model, em, anchor_pairs=(), expansion=2,
        ragged_start=False, ragged_end=False, threshold=0.2,
        compute_expectations=True)

    assert math.isclose(res["total_f"], oracle["total_log_prob_f"], rel_tol=1e-4)
    assert math.isclose(res["total_b"], oracle["total_log_prob_b"], rel_tol=1e-4)
    assert math.isclose(res["total_f"], res["total_b"], rel_tol=1e-4)

    pairs = bfb.extract_aligned_pairs(problem, res["post"], threshold=0.2)
    opairs = oracle["aligned_pairs"]
    assert len(pairs) == len(opairs) == 14
    dev = {(x, y, k): p for p, x, y, k in pairs}
    for p, x, y, k in opairs:
        assert (x, y, k) in dev
        assert abs(dev[(x, y, k)] - p) <= 2e-3 * 1e7  # f32 vs f64 tolerance

    np.testing.assert_allclose(res["texp"], oracle["transition_expectations"],
                               rtol=2e-3, atol=2e-3)


def _synthetic_read(model, rng, n_kmers, params, p_stay=0.1, p_skip=0.1):
    """Generate a plausible (sequence, events) pair from the model."""
    letters = "ACGT"
    seq = "".join(rng.choice(list(letters), size=n_kmers + model.kmer_length - 1))
    ids = model.alphabet.seq_to_kmer_ids(seq)
    events = []
    truth = []
    i = 0
    while i < len(ids):
        r = rng.random()
        mean = model.level_mean[ids[i]] * params.scale + params.shift
        sd = model.level_sd[ids[i]]
        events.append([rng.normal(mean, sd * params.var), abs(rng.normal(1.0, 0.1)),
                       0.005, len(events) * 0.005])
        truth.append((i, len(events) - 1))
        if r < p_stay:
            continue  # stay: emit another event for same kmer
        if r < p_stay + p_skip:
            i += 2  # skip
        else:
            i += 1
    return seq, np.array(events), truth


def test_random_case_matches_oracle_with_anchors(r94_model):
    model = r94_model
    rng = np.random.default_rng(42)
    params = ScalingParams(shift=2.0, scale=1.05, var=1.1)
    seq, events, truth = _synthetic_read(model, rng, 48, params)
    anchors = [truth[i] for i in range(4, len(truth) - 4, 8)]
    anchors = [(x, y) for x, y in anchors]

    problem = bfb.prepare_problem(
        seq, events, model, params, DEFAULT_AMBIG_BASES,
        W=32, Dpad=len(seq) + len(events) + 8, P=1, mode=bfb.MODE_MEAN_ONLY,
        anchor_pairs=anchors, expansion=6,
        ragged_start=True, ragged_end=True)
    res = bfb.run_banded_fb(problem, W=32, P=1, with_expectations=True)

    paths = CellPaths.from_sequence(seq, model, DEFAULT_AMBIG_BASES)
    em = Emissions(model, params, mode="mean_only")
    oracle = banded_forward_backward(
        paths, events, model, em, anchor_pairs=anchors, expansion=6,
        ragged_start=True, ragged_end=True, threshold=0.01,
        compute_expectations=True)

    assert math.isclose(res["total_f"], oracle["total_log_prob_f"], rel_tol=1e-4)
    assert math.isclose(res["total_f"], res["total_b"], rel_tol=1e-4)

    pairs = bfb.extract_aligned_pairs(problem, res["post"], threshold=0.01)
    opairs = oracle["aligned_pairs"]
    dev = {(x, y): p for p, x, y, k in pairs}
    orc = {(x, y): p for p, x, y, k in opairs}
    # identical cells above threshold (allow boundary flips right at 0.01)
    sym = set(dev) ^ set(orc)
    for x, y in sym:
        p = dev.get((x, y), orc.get((x, y)))
        assert abs(p / 1e7 - 0.01) < 2e-3
    for key in set(dev) & set(orc):
        assert abs(dev[key] - orc[key]) <= 3e-3 * 1e7

    np.testing.assert_allclose(res["texp"], oracle["transition_expectations"],
                               rtol=5e-3, atol=5e-3)
    # most true (kmer, event) matches should be recovered
    hits = sum(1 for t in truth if t in dev)
    assert hits / len(truth) > 0.8


def test_emission_expectations_match_posteriors(r94_model):
    """Device per-kmer emission moments == host accumulation over the
    posterior match tensor (into-match transition posteriors sum to the
    match-state posterior at every interior cell)."""
    model = r94_model
    rng = np.random.default_rng(11)
    params = ScalingParams(shift=2.0, scale=1.05, var=1.1)
    seq, events, truth = _synthetic_read(model, rng, 40, params)
    anchors = [truth[i] for i in range(4, len(truth) - 4, 8)]
    W = 32
    problem = bfb.prepare_problem(
        seq, events, model, params, DEFAULT_AMBIG_BASES,
        W=W, Dpad=len(seq) + len(events) + 8, P=1,
        mode=bfb.MODE_MEAN_ONLY, anchor_pairs=anchors, expansion=6)
    res = bfb.run_banded_fb(problem, W=W, P=1, with_expectations=True)
    post = res["post"]
    kexp = res["kexp"]
    K = model.alphabet.num_kmers
    assert kexp.shape == (3, K)
    sp = np.zeros(K)
    sdx = np.zeros(K)
    sdx2 = np.zeros(K)
    ids = model.alphabet.seq_to_kmer_ids(seq)
    means = events[:, 0]
    for d in range(problem.n_diag + 1):
        for o in range(W):
            p = float(post[d, 0, o])
            if p <= 0:
                continue
            x = int(problem.x0[d]) + o
            y = d - x
            if x < 1 or y < 1 or x > problem.lX or y > problem.lY:
                continue
            kid = int(ids[x - 1])
            m_hat = params.scale * model.level_mean[kid] + params.shift
            dx = (means[y - 1] - m_hat) / params.var
            sp[kid] += p
            sdx[kid] += p * dx
            sdx2[kid] += p * dx * dx
    np.testing.assert_allclose(kexp[0], sp, atol=5e-3)
    np.testing.assert_allclose(kexp[1], sdx, atol=2e-2)
    np.testing.assert_allclose(kexp[2], sdx2, atol=1e-1)
    # slot conversion: Σp·x and batch-centered Σp·(x−µ̂)²
    from signalalign_tpu.models.expectations import emission_slots_from_kexp
    me, sd, po, obs = emission_slots_from_kexp(kexp, model.level_mean)
    ok = sp > 1e-3
    x_mean = model.level_mean + np.where(ok, sdx / np.maximum(sp, 1e-9), 0)
    np.testing.assert_allclose(me[ok], (sp * x_mean)[ok], rtol=1e-3)
    assert (sd >= 0).all() and (po == kexp[0]).all()
    assert obs.sum() > 20


def test_full_descaled_mode_matches_oracle(r94_model):
    model = r94_model
    rng = np.random.default_rng(7)
    params = ScalingParams(shift=1.0, scale=0.98, var=1.05, scale_sd=1.1, var_sd=0.9)
    seq, events, _ = _synthetic_read(model, rng, 24, params)
    problem = bfb.prepare_problem(
        seq, events, model, params, DEFAULT_AMBIG_BASES,
        W=64, Dpad=len(seq) + len(events) + 8, P=1, mode=bfb.MODE_FULL_DESCALED,
        anchor_pairs=(), expansion=4, scale_noise=True)
    res = bfb.run_banded_fb(problem, W=64, P=1)

    paths = CellPaths.from_sequence(seq, model, DEFAULT_AMBIG_BASES)
    em = Emissions(model, params, mode="full_descaled", scale_noise=True)
    oracle = banded_forward_backward(paths, events, model, em,
                                     anchor_pairs=(), expansion=4)
    assert math.isclose(res["total_f"], oracle["total_log_prob_f"], rel_tol=1e-4)


def test_batched_matches_single(r94_model):
    from signalalign_tpu.ops.batch import run_banded_fb_batch
    model = r94_model
    rng = np.random.default_rng(3)
    problems = []
    singles = []
    for i in range(4):
        params = ScalingParams(shift=float(rng.normal(0, 2)), scale=1.0, var=1.0 + 0.1 * i)
        seq, events, _ = _synthetic_read(model, rng, 20 + 4 * i, params)
        prob = bfb.prepare_problem(
            seq, events, model, params, DEFAULT_AMBIG_BASES,
            W=64, Dpad=256, P=1, mode=bfb.MODE_MEAN_ONLY,
            anchor_pairs=(), expansion=8)
        problems.append(prob)
        singles.append(bfb.run_banded_fb(prob, W=64, P=1, with_expectations=True))
    batch = run_banded_fb_batch(problems, W=64, P=1, with_expectations=True)
    for single, b in zip(singles, batch):
        assert math.isclose(single["total_f"], b["total_f"], rel_tol=1e-5)
        np.testing.assert_allclose(b["post"], single["post"], atol=2e-4)
        np.testing.assert_allclose(b["texp"], single["texp"], rtol=1e-3, atol=1e-3)


def test_hdp_mode_matches_oracle():
    import math
    from signalalign_tpu.models.hdp_model import load_nhdp
    from signalalign_tpu.ops.fb_oracle import (CellPaths, Emissions,
                                               banded_forward_backward)
    hdp = load_nhdp("/root/reference/models/templateSingleLevelFixed.nhdp")
    model = PoreModel.from_file(
        os.path.join(MODELS, "testModelR73_acegot_template.model"))
    rng = np.random.default_rng(0)
    seq = "ACGATALGGACATCCAGTTA"
    params = ScalingParams(shift=1.0, scale=1.0, var=1.05)
    n = len(seq) - 6 + 1
    ev = np.array([[rng.uniform(60, 90), 1.0, .005, i * .005]
                   for i in range(n + 5)])
    problem = bfb.prepare_problem(
        seq, ev, model, params, DEFAULT_AMBIG_BASES,
        W=32, Dpad=127, P=3, mode=bfb.MODE_HDP, anchor_pairs=(),
        expansion=4, hdp=hdp)
    res = bfb.run_banded_fb(problem, W=32, P=3, with_expectations=True)
    paths = CellPaths.from_sequence(seq, model, DEFAULT_AMBIG_BASES)
    em = Emissions(model, params, mode="hdp", hdp=hdp)
    oracle = banded_forward_backward(paths, ev, model, em, anchor_pairs=(),
                                     expansion=4, compute_expectations=True)
    assert math.isclose(res["total_f"], oracle["total_log_prob_f"],
                        rel_tol=1e-4)
    kp = bfb.extract_aligned_pairs(problem, res["post"], 0.01)
    op = oracle["aligned_pairs"]
    assert len(kp) == len(op)
    dk = {(x, y, k): p for p, x, y, k in kp}
    for p, x, y, k in op:
        assert (x, y, k) in dk and abs(dk[(x, y, k)] - p) < 3e-3 * 1e7


@pytest.mark.parametrize("log_space", [False, True])
def test_pallas_v2_interpret_matches_scan(r94_model, log_space):
    from signalalign_tpu.ops.banded_fb_pallas_batch import PallasBatchAligner
    from signalalign_tpu.ops.batch import run_banded_fb_batch
    model = r94_model
    rng = np.random.default_rng(5)
    problems = []
    for i in range(3):
        seq = "".join(rng.choice(list("ACGT"), size=150))
        ids = model.alphabet.seq_to_kmer_ids(seq)
        ev = np.stack([model.level_mean[ids] + rng.normal(0, 1.5, len(ids)),
                       np.ones(len(ids)), np.full(len(ids), .005),
                       np.arange(len(ids)) * .005], 1)
        anchors = [(j, j) for j in range(10, len(ids) - 10, 15)]
        problems.append(bfb.prepare_problem(
            seq, ev, model, ScalingParams(shift=1.0 + 0.3 * i),
            DEFAULT_AMBIG_BASES, W=128, Dpad=340, P=1,
            mode=bfb.MODE_MEAN_ONLY, anchor_pairs=anchors, expansion=8))
    ref = run_banded_fb_batch(problems, W=128, P=1)
    al = PallasBatchAligner(problems, W=128, T=48, S=4, RB=256,
                            interpret=True, log_space=log_space)
    # pack16: u16 posterior values for the exactness assertions below
    v2 = al.execute(compact_k=1024, pack16=True)
    v8 = al.execute(compact_k=1024)   # default 4 B/pair u8 packing
    for i, (r, p, p8) in enumerate(zip(ref, v2, v8)):
        assert math.isclose(r["total_f"], p["total_f"], rel_tol=1e-5)
        assert math.isclose(r["total_b"], p["total_b"], rel_tol=1e-5)
        sp = bfb.extract_aligned_pairs(problems[i], r["post"], 0.01)
        d1 = {(x, y): pr for pr, x, y, k in sp}
        d2 = {(x, y): pr for pr, x, y, k in p["pairs"]}
        for key in set(d1) ^ set(d2):
            pv = d1.get(key, d2.get(key))
            assert abs(pv / 1e7 - 0.01) < 2e-3
        for key in set(d1) & set(d2):
            assert abs(d1[key] - d2[key]) <= 2e-3 * 1e7
        # u8 packing: identical survivor SET (membership is decided on the
        # f32 logs before quantization), values within 1/255 plus the
        # rank-compaction's 1/1024-nat log requantization, and the
        # device cell-sort reproduces the (x+y, x) output order exactly
        d8 = {(x, y): pr for pr, x, y, k in p8["pairs"]}
        assert set(d8) == set(d2)
        for key in d8:
            assert abs(d8[key] - d2[key]) <= (1e7 / 255) * 0.51 + 1e7 / 1024 + 1
        assert [(x, y) for _, x, y, _ in p8["pairs"]] \
            == [(x, y) for _, x, y, _ in p["pairs"]]


@pytest.mark.parametrize("P,amb", [(2, "Y"), (3, "B")])
def test_pallas_v2_paths_in_lanes_matches_scan(r94_model, P, amb):
    """P>1 degenerate-base expansion on the lane-batched log kernels:
    paths-in-lanes with masked lane-roll legality reduces must reproduce
    the XLA kernels' joint totals and aligned-pair sets exactly."""
    from signalalign_tpu.ops.banded_fb_pallas_batch import PallasBatchAligner
    from signalalign_tpu.ops.batch import run_banded_fb_batch
    model = r94_model
    rng = np.random.default_rng(7)
    problems = []
    for i in range(2):
        seq = list("".join(rng.choice(list("ACGT"), size=120)))
        for pos in (30, 60, 90):
            seq[pos] = amb
        seq = "".join(seq)
        ids = model.alphabet.seq_to_kmer_ids(seq.replace(amb, "A"))
        ev = np.stack([model.level_mean[ids] + rng.normal(0, 1.5, len(ids)),
                       np.ones(len(ids)), np.full(len(ids), .005),
                       np.arange(len(ids)) * .005], 1)
        anchors = [(j, j) for j in range(10, len(ids) - 10, 15)]
        problems.append(bfb.prepare_problem(
            seq, ev, model, ScalingParams(shift=1.0 + 0.2 * i),
            DEFAULT_AMBIG_BASES, W=128, Dpad=280, P=P,
            mode=bfb.MODE_MEAN_ONLY, anchor_pairs=anchors, expansion=8))
    ref = run_banded_fb_batch(problems, W=128, P=P)
    al = PallasBatchAligner(problems, W=128, T=48, S=8, RB=256,
                            interpret=True, log_space=True, P=P)
    v2 = al.execute(compact_k=1024)
    for i, (r, q) in enumerate(zip(ref, v2)):
        assert math.isclose(r["total_f"], q["total_f"], rel_tol=1e-5)
        assert math.isclose(r["total_b"], q["total_b"], rel_tol=1e-5)
        assert not q["numerics_suspect"]
        sp = bfb.extract_aligned_pairs(problems[i], r["post"], 0.01)
        d1 = {(x, y, k): pr for pr, x, y, k in sp}
        d2 = {(x, y, k): pr for pr, x, y, k in q["pairs"]}
        assert set(d1) == set(d2)
        for key in d1:
            assert abs(d1[key] - d2[key]) <= 3e-3 * 1e7


@pytest.mark.parametrize("P,amb", [(1, None), (3, "L")])
def test_pallas_v2_hdp_stream_matches_scan(P, amb):
    """MODE_HDP on the lane kernels: the device-precomputed emission
    stream (ops/emission_stream.py spline evaluation, DMA'd per
    diagonal) must reproduce the XLA kernels' totals and pair sets,
    including combined with P>1 paths-in-lanes."""
    from signalalign_tpu.models.hdp_model import load_nhdp
    from signalalign_tpu.ops.banded_fb_pallas_batch import PallasBatchAligner
    from signalalign_tpu.ops.batch import run_banded_fb_batch
    hdp = load_nhdp("/root/reference/models/templateSingleLevelFixed.nhdp")
    model = PoreModel.from_file(
        os.path.join(MODELS, "testModelR73_acegot_template.model"))
    rng = np.random.default_rng(3)
    probs = []
    for i in range(2):
        seq = list("".join(rng.choice(list("ACGT"), size=100)))
        if amb:
            for pos in (30, 60):
                seq[pos] = amb
        seq = "".join(seq)
        ids = model.alphabet.seq_to_kmer_ids(
            seq.replace(amb, "C") if amb else seq)
        ev = np.stack([model.level_mean[ids] + rng.normal(0, 1.5, len(ids)),
                       np.ones(len(ids)), np.full(len(ids), .005),
                       np.arange(len(ids)) * .005], 1)
        anchors = [(j, j) for j in range(10, len(ids) - 10, 15)]
        probs.append(bfb.prepare_problem(
            seq, ev, model, ScalingParams(shift=1.0 + 0.1 * i, var=1.05),
            DEFAULT_AMBIG_BASES, W=128, Dpad=240, P=P,
            mode=bfb.MODE_HDP, anchor_pairs=anchors, expansion=8, hdp=hdp))
    ref = run_banded_fb_batch(probs, W=128, P=P)
    al = PallasBatchAligner(probs, W=128, T=48, S=8, RB=256,
                            interpret=True, log_space=True, P=P)
    v2 = al.execute(compact_k=1024)
    for i, (r, q) in enumerate(zip(ref, v2)):
        assert math.isclose(r["total_f"], q["total_f"], rel_tol=1e-5)
        assert math.isclose(r["total_b"], q["total_b"], rel_tol=1e-5)
        assert not q["numerics_suspect"]
        sp = bfb.extract_aligned_pairs(probs[i], r["post"], 0.01)
        d1 = {(x, y, k): pr for pr, x, y, k in sp}
        d2 = {(x, y, k): pr for pr, x, y, k in q["pairs"]}
        assert set(d1) == set(d2)
        for key in d1:
            assert abs(d1[key] - d2[key]) <= 3e-3 * 1e7


def test_pallas_v2_expectations_match_scan(r94_model):
    """In-kernel EM expectations (3-state forward stack + backward
    accumulation of the 7 transition posteriors and per-kmer emission
    moments) must match banded_fb._expectations_core."""
    from signalalign_tpu.ops.banded_fb_pallas_batch import PallasBatchAligner
    model = r94_model
    rng = np.random.default_rng(5)
    problems = []
    for i in range(3):
        seq = "".join(rng.choice(list("ACGT"), size=150))
        ids = model.alphabet.seq_to_kmer_ids(seq)
        ev = np.stack([model.level_mean[ids] + rng.normal(0, 1.5, len(ids)),
                       np.ones(len(ids)), np.full(len(ids), .005),
                       np.arange(len(ids)) * .005], 1)
        anchors = [(j, j) for j in range(10, len(ids) - 10, 15)]
        problems.append(bfb.prepare_problem(
            seq, ev, model, ScalingParams(shift=1.0 + 0.3 * i),
            DEFAULT_AMBIG_BASES, W=128, Dpad=340, P=1,
            mode=bfb.MODE_MEAN_ONLY, anchor_pairs=anchors, expansion=8))
    al = PallasBatchAligner(problems, W=128, T=48, S=4, RB=256,
                            interpret=True, log_space=True, expect=True)
    res = al.execute_expect(compact_k=1024)()
    for i, p in enumerate(problems):
        x = bfb.run_banded_fb(p, W=128, P=1, with_expectations=True)
        r = res[i]
        assert math.isclose(r["total_f"], x["total_f"], rel_tol=1e-5)
        np.testing.assert_allclose(r["texp"], x["texp"],
                                   rtol=2e-4, atol=5e-3)
        np.testing.assert_allclose(r["kexp"], x["kexp"][:, :r["kexp"].shape[1]],
                                   rtol=2e-3, atol=5e-3)
        # pairs still produced by the same pass
        sp = bfb.extract_aligned_pairs(p, x["post"], 0.01)
        assert set((a, b) for _, a, b, _ in sp) \
            == set((a, b) for _, a, b, _ in r["pairs"])


def test_pallas_v2_hdp_expectations_match_scan():
    """In-kernel EM on HDP emission streams (threeStateHdp training):
    the backward kernel's transition-posterior accumulation must match
    banded_fb._expectations_core under MODE_HDP, with the same pass
    still compacting the assignment pairs (kexp is zeros: HDP emissions
    train via Gibbs on assignments, not Gaussian moments —
    continuousHmm.c hdpHmm expectations carry transitions only)."""
    from signalalign_tpu.models.hdp_model import load_nhdp
    from signalalign_tpu.ops.banded_fb_pallas_batch import PallasBatchAligner
    hdp = load_nhdp("/root/reference/models/templateSingleLevelFixed.nhdp")
    model = PoreModel.from_file(
        os.path.join(MODELS, "testModelR73_acegot_template.model"))
    rng = np.random.default_rng(11)
    probs = []
    for i in range(3):
        seq = "".join(rng.choice(list("ACGT"), size=120))
        ids = model.alphabet.seq_to_kmer_ids(seq)
        ev = np.stack([model.level_mean[ids] + rng.normal(0, 1.5, len(ids)),
                       np.ones(len(ids)), np.full(len(ids), .005),
                       np.arange(len(ids)) * .005], 1)
        anchors = [(j, j) for j in range(10, len(ids) - 10, 15)]
        probs.append(bfb.prepare_problem(
            seq, ev, model, ScalingParams(shift=1.0 + 0.1 * i, var=1.05),
            DEFAULT_AMBIG_BASES, W=128, Dpad=288, P=1,
            mode=bfb.MODE_HDP, anchor_pairs=anchors, expansion=8, hdp=hdp))
    al = PallasBatchAligner(probs, W=128, T=48, S=4, RB=256,
                            interpret=True, log_space=True, expect=True)
    res = al.execute_expect(compact_k=1024)()
    for i, p in enumerate(probs):
        x = bfb.run_banded_fb(p, W=128, P=1, with_expectations=True)
        r = res[i]
        assert math.isclose(r["total_f"], x["total_f"], rel_tol=1e-5)
        assert math.isclose(r["total_b"], x["total_b"], rel_tol=1e-5)
        np.testing.assert_allclose(r["texp"], x["texp"],
                                   rtol=2e-4, atol=5e-3)
        assert not np.any(r["kexp"])
        sp = bfb.extract_aligned_pairs(p, x["post"], 0.01)
        assert set((a, b) for _, a, b, _ in sp) \
            == set((a, b) for _, a, b, _ in r["pairs"])
