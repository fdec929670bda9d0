"""On-device validation drives for the Pallas lane kernels (run on a real
TPU; the pytest suite pins CPU and covers the same paths in interpret
mode). Each drive cross-checks the production kernels against the exact
XLA path on the BUNDLED REAL READS — the checks that caught both round-2
numerics bugs (u16 stack clamp pair loss, leapfrog clip mass loss) were
exactly these: pair-level set comparisons on real data, not synthetic
shapes or totals alone.

Usage:
    python scripts/validate_tpu.py pairs    # 1D lane kernels vs XLA
    python scripts/validate_tpu.py methyl   # HDP + P=2 runner drive
    python scripts/validate_tpu.py speed    # device-only throughput
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

REF = "/root/reference"
ONED = os.path.join(REF, "tests/minion_test_reads/1D")
MODEL_1D = os.path.join(REF,
                        "models/testModelR9p4_5mer_acegt_template.model")


def _ecoli_fasta():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    b = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(b)
    return b


def drive_pairs():
    """Every bundled 1D bucket through the lane kernels vs XLA:
    totals to 0.05 nats, identical aligned-pair sets."""
    from signalalign_tpu.ops import banded_fb as bfb
    from signalalign_tpu.ops.banded_fb_pallas_batch import \
        PallasBatchAligner
    b = _ecoli_fasta()
    wl = b.build_workload()
    ok_all = True
    for W, kind, probs in wl:
        if kind != "v2":
            continue
        K = max(((3 * max(p.lY for p in probs) + 127) // 128) * 128, 1024)
        al = PallasBatchAligner(probs, W=W, T=120, S=128, RB=256,
                                log_space=True)
        res = al.execute(compact_k=K)
        # distinct problems only (buckets replicate to fill stripes)
        seen = set()
        for j, p in enumerate(probs):
            key = id(p)       # buckets pad by REPEATING problem objects
            if key in seen:
                continue
            seen.add(key)
            x = bfb.run_banded_fb(p, W=W, P=1)
            xp = bfb.extract_aligned_pairs(p, x["post"], 0.01)
            d1 = {(xx, yy): pr for pr, xx, yy, k in xp}
            d2 = {(xx, yy): pr for pr, xx, yy, k in res[j]["pairs"]}
            # pairs present on one side only must sit at the 0.01
            # threshold boundary (f32 lane-vs-XLA roundoff + u8 result
            # quantization legitimately flips cells within ~0.005 of it)
            edge = 0.015 * 1e7
            strays = [d2[c] for c in set(d2) - set(d1)] \
                + [d1[c] for c in set(d1) - set(d2)]
            # strays must sit at the boundary AND be rare: a systematic
            # low-weight divergence (many spurious/missing sub-edge
            # pairs) should still fail validation
            max_strays = max(5, len(d1) // 200)
            seteq = (all(pr <= edge for pr in strays)
                     and len(strays) <= max_strays)
            tfe = abs(res[j]["total_f"] - x["total_f"])
            ok = seteq and tfe < 0.05 and not res[j]["numerics_suspect"]
            ok_all &= ok
            print(f"W={W} seg lY={p.lY}: tf_err={tfe:.4f} "
                  f"pairs xla={len(d1)} lane={len(d2)} seteq={seteq} "
                  f"{'OK' if ok else 'FAIL'}")
    print("PAIRS: ALL OK" if ok_all else "PAIRS: FAILURES")
    return ok_all


def drive_methyl():
    """Methylation/variant workload (HDP stream + P=2 paths-in-lanes)
    through run_alignment_batch vs the XLA path on the zymo reads."""
    import signalalign_tpu.pipeline.signal_align as sa
    from signalalign_tpu.io.minialign import generate_guide_alignment
    from signalalign_tpu.io.read import NanoporeRead2DData
    from signalalign_tpu.io.reference import ProcessedReference
    from signalalign_tpu.models.hdp_model import load_nhdp
    from signalalign_tpu.models.pore_model import PoreModel
    from signalalign_tpu.ops import banded_fb as bfb
    from signalalign_tpu.pipeline.runner import run_alignment_batch

    zymo = os.path.join(REF, "tests/test_sequences/zymo_sequence.fasta")
    model = PoreModel.from_file(
        os.path.join(REF, "models/testModelR73_acegot_template.model"))
    hdp = load_nhdp(
        os.path.join(REF, "models/templateSingleLevelFixed.nhdp"))
    ambig_ref = ProcessedReference(zymo, motifs=[("CG", "PG")])
    plain_ref = ProcessedReference(zymo)
    pairs = []
    for d in ("C", "mC"):
        for path in sorted(glob.glob(os.path.join(
                REF, f"tests/minion_test_reads/{d}/*.fast5"))):
            try:
                r2 = NanoporeRead2DData.from_fast5(path)
                g = generate_guide_alignment(r2.twod_sequence, plain_ref)
                if g:
                    pairs.append((r2.template, g))
            except Exception as exc:
                print("skip", path, exc)
    cfg = sa.AlignmentConfig(emission_mode=bfb.MODE_HDP,
                             ambig_map={"P": "CE"})
    t0 = time.time()
    res_p = run_alignment_batch(pairs, ambig_ref, model, cfg, hdp=hdp,
                                use_pallas=True, verbose=True)
    t1 = time.time()
    res_x = run_alignment_batch(pairs, ambig_ref, model, cfg, hdp=hdp,
                                use_pallas=False, verbose=True)
    t2 = time.time()
    print(f"lane kernels {t1-t0:.1f}s, XLA {t2-t1:.1f}s")
    ok_all = True
    for rp, rx in zip(res_p, res_x):
        if rp is None or rx is None:
            ok_all &= rp is None and rx is None
            continue
        dp = {(x, y, k): p for p, x, y, k in rp.aligned_pairs}
        dx = {(x, y, k): p for p, x, y, k in rx.aligned_pairs}
        both = set(dp) & set(dx)
        maxd = max((abs(dp[k] - dx[k]) for k in both), default=0) / 1e7
        seteq = set(dp) == set(dx)
        ok_all &= seteq and maxd < 4e-3
        print(f"{rp.read_label[:12]}: tf lane={rp.total_log_prob:.2f} "
              f"xla={rx.total_log_prob:.2f} pairs {len(dp)}/{len(dx)} "
              f"seteq={seteq} maxdiff={maxd:.4f}")
    print("METHYL: ALL OK" if ok_all else "METHYL: FAILURES")
    return ok_all


def drive_expect():
    """EM expectation pass on the lane kernels vs the XLA expectations
    core, on the bundled 1D reads (capped segments, as em_train runs)."""
    from signalalign_tpu.ops import banded_fb as bfb
    from signalalign_tpu.ops.banded_fb_pallas_batch import \
        PallasBatchAligner
    b = _ecoli_fasta()
    wl = b.build_workload()
    ok_all = True
    for W, kind, probs in wl:
        if kind != "v2" or W > 512:
            continue
        if max(p.n_diag for p in probs) > 3200:
            continue   # em_train caps segment length below this
        K = max(((3 * max(p.lY for p in probs) + 127) // 128) * 128, 1024)
        al = PallasBatchAligner(probs, W=W, T=120, S=128, RB=256,
                                log_space=True, expect=True)
        res = al.execute_expect(compact_k=K)()
        seen = set()
        for j, p in enumerate(probs):
            if id(p) in seen:
                continue
            seen.add(id(p))
            x = bfb.run_banded_fb(p, W=W, P=1, with_expectations=True)
            dt = np.abs(res[j]["texp"] - x["texp"]).max()
            rel = dt / max(float(x["texp"].max()), 1.0)
            dk = np.abs(res[j]["kexp"]
                        - x["kexp"][:, :res[j]["kexp"].shape[1]]).max()
            ok = rel < 1e-3 and dk < 0.05
            ok_all &= ok
            print(f"W={W} lY={p.lY}: texp rel={rel:.2e} kexp maxd={dk:.4f}"
                  f" {'OK' if ok else 'FAIL'}")
    # HDP-mode expect (threeStateHdp transition EM): the P=1 buckets of
    # the zymo methylation workload, in-kernel texp vs the XLA core
    for W, P, probs in b.build_methyl_workload():
        if P != 1 or W > 512:
            continue
        if max(p.n_diag for p in probs) > 3200:
            continue
        K = max(((3 * max(p.lY for p in probs) + 127) // 128) * 128, 1024)
        al = PallasBatchAligner(probs, W=W, T=120, S=128, RB=256,
                                log_space=True, expect=True)
        res = al.execute_expect(compact_k=K)()
        seen = set()
        for j, p in enumerate(probs):
            if id(p) in seen:
                continue
            seen.add(id(p))
            x = bfb.run_banded_fb(p, W=W, P=1, with_expectations=True)
            dt = np.abs(res[j]["texp"] - x["texp"]).max()
            rel = dt / max(float(x["texp"].max()), 1.0)
            ok = rel < 1e-3
            ok_all &= ok
            print(f"HDP W={W} lY={p.lY}: texp rel={rel:.2e}"
                  f" {'OK' if ok else 'FAIL'}")
    print("EXPECT: ALL OK" if ok_all else "EXPECT: FAILURES")
    return ok_all


def drive_speed():
    """Device-only throughput per bucket (totals/counts fetch only)."""
    from signalalign_tpu.ops.banded_fb_pallas_batch import \
        PallasBatchAligner
    b = _ecoli_fasta()
    wl = b.build_workload()
    tot_ev = tot_t = 0.0
    for W, kind, probs in wl:
        if kind != "v2":
            continue
        K = max(((3 * max(p.lY for p in probs) + 127) // 128) * 128, 1024)
        al = PallasBatchAligner(probs, W=W, T=120, S=128, RB=256,
                                log_space=True)
        al.execute_device_only(compact_k=K)()   # compile
        t0 = time.perf_counter()
        for _ in range(3):
            al.execute_device_only(compact_k=K)()
        dt = (time.perf_counter() - t0) / 3
        ev = sum(p.lY for p in probs)
        print(f"W={W}: {dt*1000:.1f} ms -> {ev/dt:,.0f} ev/s")
        tot_ev += ev
        tot_t += dt
    print(f"ALL v2 buckets: {tot_ev/tot_t:,.0f} ev/s device-only")


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "pairs"
    ok = {"pairs": drive_pairs, "methyl": drive_methyl,
          "expect": drive_expect, "speed": drive_speed}[what]()
    sys.exit(0 if ok is not False else 1)
