"""Measure the probability-space kernels' residual-check trip rate
(VERDICT r2 item 2): how often the fwd/bwd-total residual or the
compaction-overflow flag sends a lane to the exact re-run path, over

  (a) ALL bundled 1D read segments (the production workload), and
  (b) adversarial synthetics engineered for deep within-band dynamic
      range (dead-end high-scoring prefixes, wide bulge bands).

Also cross-checks prob-space pair sets against the exact log-space
kernels on non-tripped lanes. Writes PROB_TRIP_RATE.json at the repo
root — the artifact that justifies (or vetoes) making prob-space the
default for W <= 512 buckets.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as b


def drive_bundled():
    from signalalign_tpu.ops.banded_fb_pallas_batch import \
        PallasBatchAligner

    wl = b.build_workload()
    out = {"lanes": 0, "tripped": 0, "pair_mismatch": 0, "buckets": []}
    for W, kind, probs in wl:
        if kind != "v2" or W > 512:
            continue
        K = max(((3 * max(p.lY for p in probs) + 127) // 128) * 128, 1024)
        al_p = PallasBatchAligner(probs, W=W, T=120, S=128, RB=256,
                                  log_space=False)
        res_p = al_p.execute(compact_k=K)
        al_l = PallasBatchAligner(probs, W=W, T=120, S=128, RB=256,
                                  log_space=True)
        res_l = al_l.execute(compact_k=K)
        trips = sum(1 for r in res_p if r["numerics_suspect"])
        mism = 0
        for rp, rl in zip(res_p, res_l):
            if rp["numerics_suspect"]:
                continue
            sp = {(x, y) for _, x, y, _ in rp["pairs"]}
            sl = {(x, y) for _, x, y, _ in rl["pairs"]}
            stray = sp ^ sl
            # boundary tolerance (see validate_tpu): one-sided pairs at
            # the threshold edge are legitimate quantization flips
            edge = 0.015 * 1e7
            hard = [c for c in stray
                    if max(dict((( x, y), p) for p, x, y, _ in
                                (rp["pairs"] if c in sp else rl["pairs"])
                                ).get(c, 0), 0) > edge]
            if hard or len(stray) > max(5, len(sl) // 200):
                mism += 1
        out["lanes"] += len(res_p)
        out["tripped"] += trips
        out["pair_mismatch"] += mism
        out["buckets"].append({"W": W, "lanes": len(res_p),
                               "tripped": trips, "pair_mismatch": mism})
        print(f"W={W}: {trips}/{len(res_p)} tripped, "
              f"{mism} non-tripped pair mismatches", flush=True)
    return out


def drive_adversarial():
    """Synthetics with dead-end high-scoring prefixes: the read matches
    the reference well for a long stretch that then diverges hard, so
    within-band cells dip hundreds of nats below the ridge before the
    path rejoins — the regime where prob-space f32 truncates."""
    from signalalign_tpu.models.pore_model import PoreModel, ScalingParams
    from signalalign_tpu.ops import banded_fb as bfb
    from signalalign_tpu.ops.banded_fb_pallas_batch import \
        PallasBatchAligner
    from signalalign_tpu.utils.alphabet import DEFAULT_AMBIG_BASES

    model = PoreModel.from_file(b.MODEL)
    rng = np.random.default_rng(7)
    letters = "ACGT"
    probs = []
    for case in range(32):
        L = 900
        seq = "".join(rng.choice(list(letters), size=L))
        ids = model.alphabet.seq_to_kmer_ids(seq)
        events = []
        for i, kid in enumerate(ids):
            # long runs emitted from the WRONG kmer's distribution create
            # deep likelihood canyons inside the band
            if case % 2 == 0 and 300 < i < 420:
                kid2 = int(rng.integers(0, model.alphabet.num_kmers))
                mu = model.level_mean[kid2] + 30.0
            else:
                mu = model.level_mean[kid]
            events.append([rng.normal(mu, model.level_sd[kid]),
                           1.0, .002, len(events) * .002])
            while rng.random() < 0.3:
                events.append([rng.normal(mu, model.level_sd[kid] * 3),
                               1.0, .002, len(events) * .002])
        events = np.asarray(events)
        probs.append(bfb.prepare_problem(
            seq, events, model, ScalingParams(), DEFAULT_AMBIG_BASES,
            W=1024, Dpad=4096, P=1, mode=bfb.MODE_MEAN_ONLY,
            expansion=160))
    # pad to a full stripe
    while len(probs) % 128:
        probs.append(probs[-1])
    al_p = PallasBatchAligner(probs, W=1024, T=120, S=128, RB=256,
                              log_space=False)
    res_p = al_p.execute(compact_k=4096)
    trips = sum(1 for r in res_p[:32] if r["numerics_suspect"])
    print(f"adversarial: {trips}/32 tripped", flush=True)
    # the guard must catch truncation: compare non-tripped totals to the
    # exact log kernels
    al_l = PallasBatchAligner(probs, W=1024, T=120, S=128, RB=256,
                              log_space=True)
    res_l = al_l.execute(compact_k=4096)
    guard_miss = 0
    for rp, rl in zip(res_p[:32], res_l[:32]):
        if rp["numerics_suspect"]:
            continue
        if abs(rp["total_f"] - rl["total_f"]) > 0.5:
            guard_miss += 1
    print(f"adversarial guard misses (non-tripped but wrong total): "
          f"{guard_miss}", flush=True)
    return {"lanes": 32, "tripped": trips, "guard_miss": guard_miss}


def main():
    bundled = drive_bundled()
    adv = drive_adversarial()
    rate = bundled["tripped"] / max(bundled["lanes"], 1)
    out = {"bundled": bundled, "adversarial": adv,
           "bundled_trip_rate": round(rate, 4)}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROB_TRIP_RATE.json")
    path = os.path.join("/root/repo", "PROB_TRIP_RATE.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
