"""Split the compaction cost: chunk map vs global sort vs buf bitcast,
using the prefix-diff method (each prefix ends in a tiny fetched
scalar). Run on a quiet machine."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as b


def main():
    import jax
    import jax.numpy as jnp

    from signalalign_tpu.ops import banded_fb_pallas_batch as pb
    from signalalign_tpu.ops.banded_fb_pallas_batch import (
        PallasBatchAligner, _totals_cvec_df, pallas_backward_b,
        pallas_forward_b)

    reps = int(os.environ.get("PROF_REPS", "4"))
    which = sys.argv[1:] or ["256", "512"]
    workload = b.build_workload()
    for W, kind, probs in workload:
        if kind != "v2" or not any(str(W) == w for w in which):
            continue
        K = max(((3 * max(p.lY for p in probs) + 127) // 128) * 128, 1024)
        ev = sum(p.lY for p in probs)
        al = PallasBatchAligner(probs, W=W, T=120, S=128, RB=256,
                                log_space=True)
        T, WB, S, RB = al.T, al.WB, al.S, al.RB
        print(f"bucket W={W} Dp1p={al.Dp1p} WB={WB} events={ev} K={K}",
              flush=True)
        log_thr = jnp.float32(np.log(0.01))
        G = al.G
        Dp1p = al.Dp1p
        C = T
        NC = Dp1p // C
        R = 8
        UMAX = jnp.uint32(0xFFFFFFFF)

        @functools.partial(jax.jit, static_argnames=("stage",))
        def compact_stage(postlog, cvec, n_diag, *, stage):
            def chunk(ci):
                c0 = ci * C
                pq = jax.lax.dynamic_slice_in_dim(postlog, c0, C, axis=1)
                pl_ = pb._dequant_rows(pq)
                cv = jax.lax.dynamic_slice_in_dim(cvec, c0, C, axis=1)
                d_idx = (c0 + jnp.arange(C, dtype=jnp.int32))[None, :,
                                                              None]
                sub = jnp.arange(WB, dtype=jnp.uint32)[None, None, :,
                                                       None]
                v = pl_ + cv[:, :, None, :]
                valid = ((d_idx[..., None] <= n_diag[:, None, None, :]) &
                         (pq < pb.QMAX) & (v >= log_thr))
                qe = jnp.minimum(jnp.round(jnp.maximum(-v, 0.0)
                                           * pb.QSCALE),
                                 4095.0).astype(jnp.uint32)
                key = jnp.where(valid, (sub << jnp.uint32(12)) | qe, UMAX)
                cnt = jnp.sum(valid.astype(jnp.int32), axis=2)
                slots = []
                prev = None
                for r in range(R):
                    cur = key if prev is None else \
                        jnp.where(key > prev[:, :, None, :], key, UMAX)
                    nxt = jnp.min(cur, axis=2)
                    slots.append(nxt)
                    prev = nxt
                return jnp.stack(slots, axis=-1), cnt

            ws, cnts = jax.lax.map(chunk, jnp.arange(NC))
            if stage == 0:      # chunk map only
                return jnp.sum(cnts) + jnp.sum(ws[..., 0] & 1)
            w = jnp.transpose(ws, (1, 3, 0, 2, 4)).reshape(G, S, Dp1p * R)
            if stage == 1:      # + transpose/reshape
                return jnp.sum(w[:, :, ::31] & 1) + jnp.sum(cnts)
            d = (jnp.arange(Dp1p * R, dtype=jnp.uint32)
                 // jnp.uint32(R))[None, None, :]
            pos = w >> jnp.uint32(12)
            qe2 = (w & jnp.uint32(4095)).astype(jnp.float32)
            p8 = jnp.round(jnp.exp(qe2 * jnp.float32(-1.0 / pb.QSCALE))
                           * 255.0).astype(jnp.uint32)
            cell = d * jnp.uint32(WB) + pos
            key2 = jnp.where(w != UMAX, (cell << jnp.uint32(8)) | p8,
                             UMAX)
            if stage == 2:      # + key build
                return jnp.sum(key2[:, :, ::31] & 1) + jnp.sum(cnts)
            key2 = jax.lax.sort(key2, dimension=2)
            if stage == 3:      # + sort
                return jnp.sum(key2[:, :, ::31] & 1) + jnp.sum(cnts)
            buf = jax.lax.bitcast_convert_type(key2[:, :, :K], jnp.uint8)
            return (jnp.sum(buf[:, :, ::63, 0].astype(jnp.int32))
                    + jnp.sum(cnts))

        # build inputs once (sweeps), keep on device
        fstack, f_incr, f_lse = pallas_forward_b(
            al.geom, al.refwin, al.evinit_f, al.evins_f, al.pack,
            al.lseflag, None, None, WB=WB, T=T, S=S, RB=RB,
            log_space=True)
        postlog, b_incr, b_lse, fmax = pallas_backward_b(
            al.geom, al.refwin, al.evinit_b, al.evins_b, al.pack,
            fstack, None, None, None, WB=WB, T=T, S=S, RB=RB,
            fuse_post=True, log_space=True)
        cvec, tf_hi, *_ = _totals_cvec_df(f_incr, b_incr, f_lse, b_lse,
                                          al.n_diag, T=T)
        cvec2 = cvec + fmax
        del fstack
        names = ["map", "+transpose", "+key", "+sort", "+bitcast/slice"]
        prev_t = 0.0
        for stage in range(5):
            float(np.asarray(compact_stage(postlog, cvec2, al.n_diag,
                                           stage=stage)))   # compile
            t0 = time.perf_counter()
            for _ in range(reps):
                float(np.asarray(compact_stage(postlog, cvec2, al.n_diag,
                                               stage=stage)))
            dt = (time.perf_counter() - t0) / reps
            print(f"  {names[stage]:16s} {dt * 1e3:9.2f} ms "
                  f"(+{(dt - prev_t) * 1e3:7.2f})", flush=True)
            prev_t = dt


if __name__ == "__main__":
    main()
