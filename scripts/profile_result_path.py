"""Per-stage device timing of the posterior pipeline on the bench
workload. block_until_ready is unreliable through the axon tunnel, so
each measured prefix of the chain ends in a tiny scalar reduction
FETCHED to host (np.asarray) — real execution, ~4 bytes of transfer.
Stage cost = difference between consecutive prefixes.

Every rep runs on jittered inputs: the axon backend caches executions
keyed on (executable, input buffers) ACROSS PROCESSES, so identical
reps return instantly and time nothing (see bench._jitter_inputs).

Run serially (no other TPU process) — concurrent tunnel use skews
measurements.
"""

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
    workload = b.build_workload()
    which = sys.argv[1:] or None
    rows = []
    for W, kind, probs in workload:
        if kind != "v2":
            continue
        nd = max(p.n_diag for p in probs)
        if which and not any(str(W) == w for w in which):
            continue
        K = max(((3 * max(p.lY for p in probs) + 127) // 128) * 128, 1024)
        ev = sum(p.lY for p in probs)
        al = PallasBatchAligner(probs, W=W, T=120, S=128, RB=256,
                                log_space=True)
        T, WB, S, RB = al.T, al.WB, al.S, al.RB
        print(f"bucket W={W} n_diag={nd} Dp1p={al.Dp1p} WB={WB} "
              f"events={ev} K={K}", flush=True)
        log_thr = jnp.float32(np.log(0.01))

        @jax.jit
        def probe(x):
            return jnp.sum(x[..., ::17].astype(jnp.float32))

        # pre-generated jittered packs: the jitter dispatch (device
        # multiply + fresh buffer) must stay OUTSIDE the timed region so
        # absolute per-stage times exclude it (advisor r03); swapping a
        # prebuilt buffer in costs nothing
        pack0 = al.pack
        import itertools as _it
        _packs = [pack0 * jnp.float32(1.0 + 1e-6 * b._next_jitter())
                  for _ in range(17)]
        for _p in _packs:
            _p.block_until_ready()
        _pack_iter = _it.cycle(_packs)

        def prefix(depth):
            al.pack = next(_pack_iter)
            fstack, f_incr, f_lse = pallas_forward_b(
                al.geom, al.refwin, al.evinit_f, al.evins_f, al.pack,
                al.lseflag, None, None, WB=WB, T=T, S=S, RB=RB,
                log_space=True)
            if depth == 0:
                return float(np.asarray(probe(f_lse)))
            postlog, b_incr, b_lse, fmax = pallas_backward_b(
                al.geom, al.refwin, al.evinit_b, al.evins_b, al.pack,
                fstack, None, None, None, WB=WB, T=T, S=S, RB=RB,
                fuse_post=True, log_space=True)
            if depth == 1:
                return float(np.asarray(probe(b_lse)))
            cvec, tf_hi, tf_lo, tb_hi, tb_lo = _totals_cvec_df(
                f_incr, b_incr, f_lse, b_lse, al.n_diag, T=T)
            cvec2 = cvec + fmax
            if depth == 2:
                return float(np.asarray(probe(tf_hi) + probe(cvec2[:, ::64])))
            buf, counts, overflow = _compact_chunked(
                postlog, cvec2, al.xoffs, al.widths, al.n_diag, log_thr,
                K=K, C=T)
            return float(np.asarray(probe(counts)))

        names = ["fwd", "fwd+bwd", "+totals", "+compact"]
        times = []
        for depth in range(4):
            prefix(depth)          # compile + warm
            t0 = time.perf_counter()
            for _ in range(reps):
                prefix(depth)
            times.append((time.perf_counter() - t0) / reps)
            print(f"  {names[depth]:10s} {times[-1] * 1e3:9.2f} ms",
                  flush=True)
        stage = [times[0]] + [times[i] - times[i - 1] for i in range(1, 4)]
        print(f"  stages: fwd={stage[0] * 1e3:.1f} bwd={stage[1] * 1e3:.1f} "
              f"totals={stage[2] * 1e3:.1f} compact={stage[3] * 1e3:.1f} ms "
              f"| pipeline {ev / times[3] / 1e6:.2f}M ev/s, sweeps-only "
              f"{ev / times[1] / 1e6:.2f}M", flush=True)
        rows.append((ev, times))
    evs = sum(r[0] for r in rows)
    if rows:
        t_all = sum(r[1][3] for r in rows)
        t_sw = sum(r[1][1] for r in rows)
        print(f"ALL: {evs / t_all / 1e6:.2f}M ev/s pipeline, "
              f"{evs / t_sw / 1e6:.2f}M sweeps-only")


if __name__ == "__main__":
    main()
