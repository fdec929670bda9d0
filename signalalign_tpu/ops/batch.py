"""Batched execution of banded-FB problems.

Problems sharing a (W, Dpad, P, mode) bucket are stacked along a leading
axis and run through the vmapped kernels, so each scan step processes a
(B, 3, P, W) tensor — this is where TPU throughput comes from (one read's
diagonal is far too small to keep the VPU busy).

This replaces the reference's process pool over reads
(utils/multithread.py:79-236 + one signalMachine subprocess per read).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from signalalign_tpu.ops import banded_fb as bfb


def _pad_last(arr: np.ndarray, size: int) -> np.ndarray:
    if arr.shape[-1] == size:
        return arr
    pad = [(0, 0)] * (arr.ndim - 1) + [(0, size - arr.shape[-1])]
    return np.pad(arr, pad)


def stack_kmer_ids(problems: Sequence[bfb.BandedProblem]):
    """Stacked (B, P, LX) kmer-id windows (emission-EM segment-sum keys)."""
    LX = max(p.ref_params.shape[-1] for p in problems)
    return jnp.asarray(np.stack([_pad_last(p.kmer_ids, LX)
                                 for p in problems]))


def stack_problems(problems: Sequence[bfb.BandedProblem]):
    """Stack same-bucket problems into batched device arrays."""
    LX = max(p.ref_params.shape[-1] for p in problems)
    LE = max(p.ev_params.shape[-1] for p in problems)
    Dp = max(p.x0.shape[0] for p in problems)
    assert all(p.x0.shape[0] == Dp for p in problems), "Dpad mismatch in bucket"

    def stk(get, size=None):
        arrs = [get(p) for p in problems]
        if size is not None:
            arrs = [_pad_last(a, size) for a in arrs]
        return jnp.asarray(np.stack(arrs))

    args = (
        stk(lambda p: p.x0),
        stk(lambda p: p.width),
        stk(lambda p: p.ref_params, LX),
        stk(lambda p: p.legal, LX),
        stk(lambda p: p.ev_params, LE),
        stk(lambda p: p.log_trans),
        stk(lambda p: p.start_logs),
        stk(lambda p: p.end_logs),
        jnp.asarray(np.array([p.var for p in problems], dtype=bfb.DTYPE)),
        jnp.asarray(np.array([p.lX for p in problems], dtype=np.int32)),
        jnp.asarray(np.array([p.lY for p in problems], dtype=np.int32)),
        jnp.asarray(np.array([p.n_diag for p in problems], dtype=np.int32)),
        jnp.asarray(np.array([p.ev_front_pad for p in problems], dtype=np.int32)),
    )
    return args


def run_banded_fb_batch(problems: Sequence[bfb.BandedProblem], W: int, P: int,
                        with_expectations: bool = False,
                        compact_k: int = 0,
                        threshold: float = 0.01) -> List[Dict]:
    """Run a same-bucket batch; returns per-problem result dicts.

    With ``compact_k`` > 0 the posterior tensor stays on device and only the
    top-K cells per problem are returned (result key "pairs" holds decoded
    aligned pairs); otherwise the full "post" tensor is materialized.
    """
    if not problems:
        return []
    mode = problems[0].mode
    args = stack_problems(problems)
    sweep_args = list(args)
    if mode == bfb.MODE_HDP:
        # replicated density tables + per-problem kmer-id windows
        sweep_args += [jnp.asarray(problems[0].hdp_dens),
                       jnp.asarray(problems[0].hdp_slopes),
                       jnp.asarray(problems[0].hdp_grid),
                       stack_kmer_ids(problems)]
    fstack, f_incr, lse_f, bstack, b_incr, lse_b = bfb.banded_sweeps_batched(
        *sweep_args, W=W, P=P, mode=mode, store_full=with_expectations)

    f_incr_h = np.asarray(f_incr, dtype=np.float64)
    b_incr_h = np.asarray(b_incr, dtype=np.float64)
    lse_f_h = np.asarray(lse_f, dtype=np.float64)
    lse_b_h = np.asarray(lse_b, dtype=np.float64)

    B = len(problems)
    fo = np.cumsum(f_incr_h, axis=1)
    bo = np.cumsum(b_incr_h[:, ::-1], axis=1)[:, ::-1]
    Ds = np.array([p.n_diag for p in problems])
    total_f = lse_f_h + fo[np.arange(B), Ds]
    total_b = lse_b_h + bo[:, 0]

    cvec = (fo + bo - total_f[:, None]).astype(bfb.DTYPE)
    post = bfb.posterior_batched(
        fstack, bstack, jnp.asarray(cvec), args[0], args[1],
        jnp.asarray(Ds.astype(np.int32)), W=W, P=P)

    results = []
    if compact_k > 0:
        vals, idx = bfb.compact_posterior_topk(post, K=compact_k)
        vals_h = np.asarray(vals)
        idx_h = np.asarray(idx)
        for i, p in enumerate(problems):
            pairs = bfb.decode_topk_pairs(p, vals_h[i], idx_h[i], P, W,
                                          threshold)
            results.append({"pairs": pairs, "total_f": float(total_f[i]),
                            "total_b": float(total_b[i])})
    else:
        post_h = np.asarray(post)
        for i, p in enumerate(problems):
            results.append({"post": post_h[i], "total_f": float(total_f[i]),
                            "total_b": float(total_b[i])})

    if with_expectations:
        z = np.zeros((B, 1))
        fo_d1 = np.concatenate([z, fo[:, :-1]], axis=1)
        fo_d2 = np.concatenate([z, z, fo[:, :-2]], axis=1)
        cvec_d1 = (fo_d1 + bo - total_f[:, None]).astype(bfb.DTYPE)
        cvec_d2 = (fo_d2 + bo - total_f[:, None]).astype(bfb.DTYPE)
        num_kmers = problems[0].num_kmers
        eargs = [fstack, bstack, jnp.asarray(cvec_d1), jnp.asarray(cvec_d2),
                 args[0], args[1], args[2], args[3], args[4], args[5],
                 args[8], args[10], jnp.asarray(Ds.astype(np.int32)),
                 args[12], stack_kmer_ids(problems)]
        if mode == bfb.MODE_HDP:
            eargs += [jnp.asarray(problems[0].hdp_dens),
                      jnp.asarray(problems[0].hdp_slopes),
                      jnp.asarray(problems[0].hdp_grid)]
        texp, match_tp, kexp = bfb.expectations_batched(
            *eargs, W=W, P=P, mode=mode, num_kmers=num_kmers)
        texp_h = np.asarray(texp, dtype=np.float64)
        mtp_h = np.asarray(match_tp)
        kexp_h = np.asarray(kexp, dtype=np.float64)
        for i in range(B):
            results[i]["texp"] = texp_h[i]
            results[i]["match_tp"] = mtp_h[i]
            results[i]["kexp"] = kexp_h[i]
    return results


def group_into_buckets(problems_meta: Sequence[Tuple[int, int, int]]):
    """Group indices by (W, Dpad, P) bucket key."""
    buckets = defaultdict(list)
    for i, key in enumerate(problems_meta):
        buckets[key].append(i)
    return buckets
