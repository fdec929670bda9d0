"""Per-bucket stage split of the device-only pipeline (fwd sweep, bwd
sweep, totals scan, survivor compaction) on the production posterior
workload — prefix-diff method, each prefix synced via a tiny fetch.
Run on a quiet machine (tunnel contention garbles timings)."""

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

    reps = int(os.environ.get("PROF_REPS", "4"))
    which = sys.argv[1:]
    workload = b.build_workload()
    tot = {}
    for W, kind, probs in workload:
        if kind != "v2" or (which and not any(str(W) == w for w in which)):
            continue
        K = max(((3 * max(p.lY for p in probs) + 127) // 128) * 128, 1024)
        ev = sum(p.lY for p in probs)
        al = PallasBatchAligner(probs, W=W, T=120, S=128, RB=256,
                                log_space=True)
        T, WB, S, RB = al.T, al.WB, al.S, al.RB
        print(f"bucket W={W} Dp1p={al.Dp1p} WB={WB} events={ev} K={K}",
              flush=True)
        log_thr = jnp.float32(np.log(0.01))

        def stage_fwd():
            fstack, f_incr, f_lse = pallas_forward_b(
                al.geom, al.refwin, al.evinit_f, al.evins_f, al.pack,
                al.lseflag, None, None, WB=WB, T=T, S=S, RB=RB,
                log_space=True)
            return fstack, f_incr, f_lse

        def stage_bwd(fwd):
            fstack, f_incr, f_lse = fwd
            return pallas_backward_b(
                al.geom, al.refwin, al.evinit_b, al.evins_b, al.pack,
                fstack, None, None, None, WB=WB, T=T, S=S, RB=RB,
                fuse_post=True, log_space=True) + (f_incr, f_lse)

        def stage_tot(bwd):
            postlog, b_incr, b_lse, fmax, f_incr, f_lse = bwd
            cvec, tf_hi, tf_lo, tb_hi, tb_lo = _totals_cvec_df(
                f_incr, b_incr, f_lse, b_lse, al.n_diag, T=T)
            return postlog, cvec + fmax, tf_hi

        def stage_comp(tot_):
            postlog, cvec, tf_hi = tot_
            buf, counts, overflow = _compact_chunked(
                postlog, cvec, al.xoffs, al.widths, al.n_diag, log_thr,
                K=K, C=T)
            return counts, tf_hi

        # prefix-diff: fwd | fwd+bwd | fwd+bwd+tot | full. Completion is
        # forced by FETCHING a device-side sum (block_until_ready is not
        # a reliable forcing mechanism on this backend).
        def force(a):
            float(np.asarray(jnp.sum(a.astype(jnp.float32))))

        def run_prefix(n):
            fwd = stage_fwd()
            if n == 0:
                force(fwd[1]); return
            bwd = stage_bwd(fwd)
            if n == 1:
                force(bwd[1]); return
            t = stage_tot(bwd)
            if n == 2:
                force(t[2]); return
            c = stage_comp(t)
            force(c[0])

        names = ["fwd", "+bwd", "+totals", "+compact"]
        prev = 0.0
        stages = []
        pack0 = al.pack
        jit_ctr = [0]

        def jitter():
            # the backend caches executions on (executable, inputs) —
            # across processes; the jitter must be multiplicative (an
            # additive 1e-7 is sub-ULP for entries >= ~1.7 and rounds
            # away) and per-process unique (see bench._jitter_inputs)
            jit_ctr[0] += 1
            al.pack = pack0 * jnp.float32(
                1.0 + 1e-6 * (jit_ctr[0] + time.time() % 1.0))

        for n in range(4):
            jitter()
            run_prefix(n)   # compile
            t0 = time.perf_counter()
            for _ in range(reps):
                jitter()
                run_prefix(n)
            dt = (time.perf_counter() - t0) / reps
            stages.append(dt - prev)
            print(f"  {names[n]:10s} {dt*1e3:9.2f} ms (+{(dt-prev)*1e3:7.2f})"
                  f"  [{ev/dt/1e6:.2f} Mev/s cumulative]", flush=True)
            prev = dt
        tot[(W, al.Dp1p)] = (ev, prev, stages)
    print("\nsummary: W/Dp1p  events  total_ms  fwd/bwd/tot/comp ms")
    tev = tt = 0.0
    for (W, Dp1p), (ev, t, st) in sorted(tot.items()):
        print(f"  {W:5d}/{Dp1p:5d} {ev:9d} {t*1e3:9.2f}  "
              + "/".join(f"{s*1e3:.1f}" for s in st))
        tev += ev; tt += t
    if tt:
        print(f"aggregate: {tev/tt/1e6:.2f} Mev/s over {tev:.0f} events")


if __name__ == "__main__":
    main()
