"""Lane packing (ops/packing.py): packed-lane DP results must equal each
segment's standalone run — posteriors, per-segment totals, and EM
expectations — because start/end injections and the band gap make the
packed DP factorize exactly (see the module docstring)."""

import math

import numpy as np
import pytest

from signalalign_tpu.models.pore_model import PoreModel, ScalingParams
from signalalign_tpu.ops import banded_fb as bfb
from signalalign_tpu.ops.packing import pack_problems
from signalalign_tpu.utils.alphabet import DEFAULT_AMBIG_BASES

R94 = "/root/reference/models/testModelR9p4_5mer_acegt_template.model"


@pytest.fixture(scope="module")
def model():
    return PoreModel.from_file(R94)


def _problems(model, n, mode=bfb.MODE_MEAN_ONLY, P=1, hdp=None,
              amb=None, seed=5, var_all=None):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        L = int(rng.integers(60, 150))
        seq = "".join(rng.choice(list("ACGT"), size=L))
        if amb:
            # sparse ambiguity (spacing > k) so every kmer window holds
            # at most one degenerate base: exactly P=2 paths
            sl = list(seq)
            for j in range(10, L - 10, 3 * model.kmer_length):
                sl[j] = "P"
            seq = "".join(sl)
        ids_len = L - model.kmer_length + 1
        if ids_len < 10:
            continue
        base = "".join(c if c != "P" else "C" for c in seq)
        ids = model.alphabet.seq_to_kmer_ids(base)
        ev = np.stack([model.level_mean[ids]
                       + rng.normal(0, 1.5, len(ids)),
                       np.ones(len(ids)), np.full(len(ids), .005),
                       np.arange(len(ids)) * .005], 1)
        anchors = [(j, j) for j in range(8, len(ids) - 8, 15)]
        params = ScalingParams(shift=0.5 * i,
                               var=var_all or (1.0 + 0.2 * i))
        out.append(bfb.prepare_problem(
            seq, ev, model, params, amb or DEFAULT_AMBIG_BASES,
            W=128, Dpad=512, P=P, mode=mode, anchor_pairs=anchors,
            expansion=8, hdp=hdp))
    return out


def _flat_expected(problems, groups):
    order = []
    for g in groups:
        order.extend(g)
    return order


def test_pack_gaussian_p1(model):
    from signalalign_tpu.ops.banded_fb_pallas_batch import PallasBatchAligner
    from signalalign_tpu.ops.batch import run_banded_fb_batch

    problems = _problems(model, 5)
    ref = run_banded_fb_batch(problems, W=128, P=1)
    packed, groups = pack_problems(problems, d_target=768)
    assert len(packed) < len(problems)       # something actually packed
    al = PallasBatchAligner(packed, W=128, T=48, S=4, RB=256,
                            interpret=True, log_space=True)
    res = al.execute(compact_k=4096, pack16=True)
    order = _flat_expected(problems, groups)
    assert len(res) == len(order)
    for res_i, orig_i in zip(res, order):
        r = ref[orig_i]
        p = problems[orig_i]
        assert math.isclose(r["total_f"], res_i["total_f"], rel_tol=1e-5)
        assert math.isclose(r["total_b"], res_i["total_b"], rel_tol=1e-5)
        assert not res_i["numerics_suspect"]
        sp = bfb.extract_aligned_pairs(p, r["post"], 0.01)
        d1 = {(x, y): pr for pr, x, y, k in sp}
        d2 = {(x, y): pr for pr, x, y, k in res_i["pairs"]}
        for key in set(d1) ^ set(d2):        # threshold-edge stragglers
            pv = d1.get(key, d2.get(key))
            assert abs(pv / 1e7 - 0.01) < 2e-3
        for key in set(d1) & set(d2):
            assert abs(d1[key] - d2[key]) <= 2e-3 * 1e7


def test_pack_hdp_p2(model):
    from signalalign_tpu.models.hdp_model import load_nhdp
    from signalalign_tpu.ops.banded_fb_pallas_batch import PallasBatchAligner
    from signalalign_tpu.ops.batch import run_banded_fb_batch

    r73 = PoreModel.from_file(
        "/root/reference/models/testModelR73_acegot_template.model")
    hdp = load_nhdp(
        "/root/reference/models/templateSingleLevelFixed.nhdp")
    amb = {"P": "CE"}
    problems = _problems(r73, 4, mode=bfb.MODE_HDP, P=2, hdp=hdp,
                         amb=amb, seed=11)
    ref = run_banded_fb_batch(problems, W=128, P=2)
    packed, groups = pack_problems(problems, d_target=768)
    assert len(packed) < len(problems)
    al = PallasBatchAligner(packed, W=128, T=48, S=4, RB=256,
                            interpret=True, log_space=True, P=2)
    res = al.execute(compact_k=4096, pack16=True)
    order = _flat_expected(problems, groups)
    for res_i, orig_i in zip(res, order):
        r = ref[orig_i]
        p = problems[orig_i]
        assert math.isclose(r["total_f"], res_i["total_f"], rel_tol=1e-4)
        sp = bfb.extract_aligned_pairs(p, r["post"], 0.01)
        d1 = {}
        for pr, x, y, k in sp:
            d1[(x, y, k)] = d1.get((x, y, k), 0) + pr
        d2 = {}
        for pr, x, y, k in res_i["pairs"]:
            d2[(x, y, k)] = d2.get((x, y, k), 0) + pr
        for key in set(d1) ^ set(d2):
            pv = d1.get(key, d2.get(key))
            assert abs(pv / 1e7 - 0.01) < 5e-3
        for key in set(d1) & set(d2):
            assert abs(d1[key] - d2[key]) <= 5e-3 * 1e7


def test_pack_expect(model):
    from signalalign_tpu.ops.banded_fb_pallas_batch import PallasBatchAligner
    from signalalign_tpu.ops.batch import run_banded_fb_batch

    # EM lanes restrict packing to equal 1/var (the Gaussian moment
    # accumulator is per-lane), so use a uniform var
    problems = _problems(model, 4, seed=9, var_all=1.3)
    ref = run_banded_fb_batch(problems, W=128, P=1,
                              with_expectations=True)
    keys = [0] * len(problems)
    packed, groups = pack_problems(problems, d_target=768,
                                   same_read_keys=keys)
    al = PallasBatchAligner(packed, W=128, T=48, S=4, RB=256,
                            interpret=True, log_space=True, expect=True)
    res = al.execute_expect(compact_k=4096)()
    order = _flat_expected(problems, groups)
    texp_ref = sum(np.asarray(ref[i]["texp"]) for i in range(len(ref)))
    kexp_ref = sum(np.asarray(ref[i]["kexp"]) for i in range(len(ref)))
    texp_got = sum(np.asarray(r["texp"]) for r in res)
    kexp_got = sum(np.asarray(r["kexp"]) for r in res)
    np.testing.assert_allclose(texp_got, texp_ref, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(kexp_got, kexp_ref, rtol=2e-4, atol=1e-4)
    for res_i, orig_i in zip(res, order):
        assert math.isclose(ref[orig_i]["total_f"], res_i["total_f"],
                            rel_tol=1e-5)


def test_delta_pairs_lossless(model):
    """The 2 B/pair delta fetch stream decodes to the exact same pairs
    as the 4 B/pair direct fetch (lossless encoding)."""
    from signalalign_tpu.ops.banded_fb_pallas_batch import PallasBatchAligner

    problems = _problems(model, 3, seed=21)
    al = PallasBatchAligner(problems, W=128, T=48, S=4, RB=256,
                            interpret=True, log_space=True)
    r0 = al.execute(compact_k=2048)
    r1 = al.execute(compact_k=2048, delta_pairs=True)
    n_pairs = 0
    for a, b in zip(r0, r1):
        assert a["total_f"] == b["total_f"]
        assert a["pairs"] == b["pairs"]
        n_pairs += len(a["pairs"])
    assert n_pairs > 100

    # and through the lane-packed decode
    packed, groups = pack_problems(problems, d_target=768)
    al2 = PallasBatchAligner(packed, W=128, T=48, S=4, RB=256,
                             interpret=True, log_space=True)
    r2 = al2.execute(compact_k=4096)
    r3 = al2.execute(compact_k=4096, delta_pairs=True)
    for a, b in zip(r2, r3):
        assert a["pairs"] == b["pairs"]


def test_site_marginals_device(model):
    """Device per-site posterior sums == summing the decoded pair
    stream per (path, site cell), within quantization noise (u16 device
    stack vs u8 pair bytes)."""
    from collections import defaultdict

    from signalalign_tpu.models.hdp_model import load_nhdp
    from signalalign_tpu.ops.banded_fb_pallas_batch import PallasBatchAligner

    r73 = PoreModel.from_file(
        "/root/reference/models/testModelR73_acegot_template.model")
    hdp = load_nhdp(
        "/root/reference/models/templateSingleLevelFixed.nhdp")
    amb = {"P": "CE"}
    problems = _problems(r73, 4, mode=bfb.MODE_HDP, P=2, hdp=hdp,
                         amb=amb, seed=11)
    packed, groups = pack_problems(problems, d_target=768)
    al = PallasBatchAligner(packed, W=128, T=48, S=4, RB=256,
                            interpret=True, log_space=True, P=2)
    res = al.execute(compact_k=4096, pack16=True)
    order = _flat_expected(problems, groups)
    # sites: every ambiguous-path cell of each segment
    sites = []
    for orig_i in order:
        p = problems[orig_i]
        sites.append(np.flatnonzero(p.n_paths[:p.lX + 1] > 1))
    sm = al.execute_site_marginals(sites)()
    for res_i, sm_i, orig_i, site_x in zip(res, sm, order, sites):
        p = problems[orig_i]
        # pair-stream sums per (path kmer, x)
        by_x = defaultdict(float)
        for pr, x, y, kmer in res_i["pairs"]:
            by_x[(x + 1, kmer)] += pr / 1e7
        probs = sm_i["site_probs"]          # (PP, n_sites)
        for si_, x in enumerate(site_x):
            dev_total = probs[:, si_].sum()
            ref_total = sum(v for (xx, _), v in by_x.items() if xx == x)
            assert abs(dev_total - ref_total) < 0.05 + 0.02 * ref_total, \
                (x, dev_total, ref_total)
        # per-path check: each path lane's sum matches its kmer's mass
        for j in range(al.PP):
            for si_, x in enumerate(site_x):
                kmer = p.path_kmer_at(int(x), j)
                if kmer is None:
                    continue
                ref = by_x.get((int(x), kmer), 0.0)
                assert abs(probs[j, si_] - ref) < 0.05 + 0.02 * ref, \
                    (j, x, probs[j, si_], ref)


def test_site_marginals_to_variant_calls(model):
    """Device site sums folded per called base equal the pair-stream
    caller's per-site marginals (marginalize_full_variants semantics)."""
    from collections import defaultdict

    from signalalign_tpu.models.hdp_model import load_nhdp
    from signalalign_tpu.ops.banded_fb_pallas_batch import PallasBatchAligner
    from signalalign_tpu.pipeline.variant_caller import \
        marginals_from_site_probs

    r73 = PoreModel.from_file(
        "/root/reference/models/testModelR73_acegot_template.model")
    hdp = load_nhdp(
        "/root/reference/models/templateSingleLevelFixed.nhdp")
    amb = {"P": "CE"}
    problems = _problems(r73, 3, mode=bfb.MODE_HDP, P=2, hdp=hdp,
                         amb=amb, seed=17)
    packed, groups = pack_problems(problems, d_target=768)
    al = PallasBatchAligner(packed, W=128, T=48, S=4, RB=256,
                            interpret=True, log_space=True, P=2)
    res = al.execute(compact_k=4096, pack16=True)
    order = _flat_expected(problems, groups)
    k = r73.kmer_length
    sites = []
    for orig_i in order:
        p = problems[orig_i]
        # cells whose k-mer's LAST base sits on a degenerate position
        cells = [x for x in range(1, p.lX + 1)
                 if (p.path_kmers is not None
                     and len(p.path_kmers[x - 1]) > 1
                     and p.path_kmers[x - 1][0][k - 1]
                     != p.path_kmers[x - 1][1][k - 1])]
        sites.append(np.asarray(cells))
    sm = al.execute_site_marginals(sites)()
    for res_i, sm_i, orig_i, cells in zip(res, sm, order, sites):
        p = problems[orig_i]
        calls = marginals_from_site_probs(cells, sm_i["site_probs"], p,
                                          "CE")
        # pair-stream reference: sum by called base per site cell
        ref = defaultdict(lambda: {"C": 0.0, "E": 0.0})
        for pr, x, y, kmer in res_i["pairs"]:
            if (x + 1) in set(int(c) for c in cells):
                b = kmer[k - 1]
                if b in ("C", "E"):
                    ref[x + 1][b] += pr / 1e7
        for x in cells:
            pos = (int(x) - 1) + (k - 1)
            tot = sum(ref[int(x)].values())
            if tot <= 0 or pos not in calls:
                continue
            for b in "CE":
                assert abs(calls[pos][b] - ref[int(x)][b] / tot) < 0.02, \
                    (x, b, calls[pos][b], ref[int(x)][b] / tot)
