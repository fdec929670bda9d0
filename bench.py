"""Benchmark: banded forward-backward posterior decoding throughput.

Metric: events/s on one chip for the full device pipeline (forward +
backward sweeps + posterior extraction) over a batch of real bundled
E. coli reads with production parameters (expansion 50, trim 14,
threshold 0.01, 5-mer r9.4 model).

Baseline: the reference publishes no numbers (BASELINE.md). We use an
estimated 96-process C signalMachine aggregate of 2.88M events/s
(~30k events/s/core for the banded C DP at these band widths), which is
the production configuration in the reference README (job_count: 96).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_EVENTS_PER_S = 2.88e6  # estimated 96-core signalMachine aggregate

ONED = "/root/reference/tests/minion_test_reads/1D"
MODEL = "/root/reference/models/testModelR9p4_5mer_acegt_template.model"


def build_problems(batch: int):
    from signalalign_tpu.io.guide import guide_from_sam_record
    from signalalign_tpu.io.read import NanoporeReadData
    from signalalign_tpu.io.sam import filter_reads
    from signalalign_tpu.models.pore_model import PoreModel
    from signalalign_tpu.ops import banded_fb as bfb
    from signalalign_tpu.ops.band_geometry import (band_widths, build_band,
                                                   remap_anchors_to_events)
    from signalalign_tpu.ops.scaling import (adjust_events_for_drift,
                                             estimate_nanopore_params)
    from signalalign_tpu.utils.alphabet import DEFAULT_AMBIG_BASES
    from signalalign_tpu.io.sam import reconstruct_reference_window

    model = PoreModel.from_file(MODEL)
    pairs = filter_reads(os.path.join(ONED, "1D.bam"),
                         os.path.join(ONED, "1D.fastq.index.readdb"), [ONED])
    f5, rec = [p for p in pairs if p[1].qname.startswith("6deaf971")][0]
    read = NanoporeReadData.from_fast5(f5)
    guide = guide_from_sam_record(rec)
    window = reconstruct_reference_window(rec)
    target = window  # forward-mapped read

    params = estimate_nanopore_params(read.template_read, read.event_map,
                                      read.events, model)
    events = adjust_events_for_drift(read.events, params.drift)
    qs, qe = guide.query_start, guide.query_end
    ev_start = int(read.event_map[qs])
    ev_end = int(read.event_map[qe - 1])
    window_events = events[ev_start:ev_end]
    lX = len(target) - model.kmer_length + 1
    lY = ev_end - ev_start
    anchors = remap_anchors_to_events(guide.anchor_pairs(14),
                                      read.event_map, qs)
    anchors = [(x, y) for x, y in anchors if 0 <= x < lX and 0 <= y < lY]

    xmyL, xmyR = build_band(anchors, lX, lY, 50)
    wmax = int(band_widths(xmyL, xmyR).max())
    W = 128
    while W < wmax:
        W *= 2
    Dpad = lX + lY  # tile_geometry pads to a tile multiple

    problem = bfb.prepare_problem(
        target, window_events, model, params, DEFAULT_AMBIG_BASES,
        W=W, Dpad=Dpad, P=1, mode=bfb.MODE_MEAN_ONLY,
        anchor_pairs=anchors, expansion=50)
    return [problem] * batch, W, lY


def main():
    import jax

    from signalalign_tpu.ops.banded_fb_pallas_batch import PallasBatchAligner

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    reps = int(os.environ.get("BENCH_REPS", "8"))
    problems, W, lY = build_problems(batch)
    dev = jax.devices()[0]
    print(f"# device: {dev}, batch={batch}, W={W}, events/read={lY}",
          file=sys.stderr)

    K = 16384
    aligner = PallasBatchAligner(problems, W=W, T=24, S=128, RB=128)
    # warmup (compile)
    res = aligner.execute(compact_k=K, as_arrays=True)
    assert np.isfinite(res[0]["total_f"])
    assert len(res[0]["pairs_arrays"][0]) > lY * 0.8

    # steady-state pipelined throughput: batch i+1's kernels overlap the
    # fetch+decode of batch i (execute_async two-phase)
    t0 = time.perf_counter()
    pending = aligner.execute_async(compact_k=K, as_arrays=True)
    for _ in range(reps - 1):
        nxt = aligner.execute_async(compact_k=K, as_arrays=True)
        res = pending()
        assert np.isfinite(res[0]["total_f"])
        pending = nxt
    res = pending()
    assert np.isfinite(res[0]["total_f"])
    elapsed = time.perf_counter() - t0

    events_per_s = batch * lY * reps / elapsed
    out = {
        "metric": "banded_fb_posterior_events_per_s_per_chip",
        "value": round(events_per_s, 1),
        "unit": "events/s",
        "vs_baseline": round(events_per_s / BASELINE_EVENTS_PER_S, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
