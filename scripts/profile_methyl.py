"""Per-bucket stage split of the methylation (HDP, P<=4) device-only
pipeline: emission-stream precompute, fwd sweep, bwd sweep, totals scan,
survivor compaction — prefix-diff method (see profile_pipeline.py).
Also prints the bucket occupancy stats (problems, lanes, events, Dp1p)
so padding waste is visible."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as b


def main():
    import jax
    import jax.numpy as jnp

    from signalalign_tpu.ops.banded_fb_pallas_batch import (
        PallasBatchAligner, _compact_chunked, _totals_cvec_df,
        pallas_backward_b, pallas_forward_b)
    from signalalign_tpu.ops.emission_stream import hdp_emission_stacks

    reps = int(os.environ.get("PROF_REPS", "4"))
    wl = b.build_methyl_workload()
    print(f"{len(wl)} buckets")
    tot = {}
    for W, P, probs in wl:
        K = max(((3 * max(p.lY for p in probs) + 127) // 128) * 128, 1024)
        ev = sum(p.lY for p in probs)
        al = PallasBatchAligner(probs, W=W, T=120, S=128, RB=256,
                                log_space=True, P=P)
        T, WB, S, RB = al.T, al.WB, al.S, al.RB
        nd = [p.n_diag for p in probs]
        print(f"bucket W={W} P={P} probs={len(probs)} G={al.G} "
              f"Dp1p={al.Dp1p} n_diag=[{min(nd)},{max(nd)}] WB={WB} "
              f"events={ev} K={K}", flush=True)
        log_thr = jnp.float32(np.log(0.01))

        def stage_es():
            return hdp_emission_stacks(
                *al.stream_in, al.hdp_dens, al.hdp_slopes, al.hdp_grid,
                T=T, WBe=al.WBe, maxb=al.bank_maxb)

        def stage_fwd(es):
            estack, ebnd = es
            return pallas_forward_b(
                al.geom, al.refwin, al.evinit_f, al.evins_f, al.pack,
                al.lseflag, al.legf, estack, WB=WB, T=T, S=S, RB=RB,
                log_space=True, PP=al.PP, estream=True) + (estack, ebnd)

        def stage_bwd(fwd):
            fstack, f_incr, f_lse, estack, ebnd = fwd
            return pallas_backward_b(
                al.geom, al.refwin, al.evinit_b, al.evins_b, al.pack,
                fstack, al.legb, estack, ebnd, WB=WB, T=T, S=S, RB=RB,
                fuse_post=True, log_space=True, PP=al.PP,
                estream=True) + (f_incr, f_lse)

        def stage_tot(bwd):
            postlog, b_incr, b_lse, fmax, f_incr, f_lse = bwd
            cvec, tf_hi, tf_lo, tb_hi, tb_lo = _totals_cvec_df(
                f_incr, b_incr, f_lse, b_lse, al.n_diag, T=T, PP=al.PP)
            return postlog, cvec + fmax, tf_hi

        def stage_comp(tot_):
            postlog, cvec, tf_hi = tot_
            buf, counts, overflow = _compact_chunked(
                postlog, cvec, al.xoffs, al.widths, al.n_diag, log_thr,
                K=K, C=T)
            return counts, tf_hi

        def force(a):
            float(np.asarray(jnp.sum(a.astype(jnp.float32))))

        def run_prefix(n):
            es = stage_es()
            if n == 0:
                force(es[0]); return
            fwd = stage_fwd(es)
            if n == 1:
                force(fwd[1]); return
            bwd = stage_bwd(fwd)
            if n == 2:
                force(bwd[1]); return
            t = stage_tot(bwd)
            if n == 3:
                force(t[2]); return
            c = stage_comp(t)
            force(c[0])

        names = ["estream", "+fwd", "+bwd", "+totals", "+compact"]
        prev = 0.0
        stages = []
        si0 = al.stream_in
        jit_ctr = [0]

        def jitter():
            jit_ctr[0] += 1
            f = jnp.float32(1.0 + 1e-6 * (jit_ctr[0] + time.time() % 1.0))
            si = list(si0)
            si[1] = si0[1] * f
            al.stream_in = tuple(si)

        for n in range(5):
            jitter()
            run_prefix(n)   # compile
            t0 = time.perf_counter()
            for _ in range(reps):
                jitter()
                run_prefix(n)
            dt = (time.perf_counter() - t0) / reps
            stages.append(dt - prev)
            print(f"  {names[n]:10s} {dt*1e3:9.2f} ms (+{(dt-prev)*1e3:7.2f})"
                  f"  [{ev/dt/1e3:.1f} kev/s cumulative]", flush=True)
            prev = dt
        tot[(W, P)] = (ev, prev, stages)
    print("\nsummary: W P  events  total_ms  es/fwd/bwd/tot/comp ms")
    tev = tt = 0.0
    for (W, P), (ev, t, st) in sorted(tot.items()):
        print(f"  {W:5d} {P} {ev:8d} {t*1e3:9.2f}  "
              + "/".join(f"{s*1e3:.1f}" for s in st))
        tev += ev; tt += t
    if tt:
        print(f"aggregate: {tev/tt/1e3:.1f} kev/s over {tev:.0f} events")


if __name__ == "__main__":
    main()
