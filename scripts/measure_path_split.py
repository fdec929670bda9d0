"""Measure path_split at flowcell scale (VERDICT r4 item 2b).

path_split isolates sparse adjacent-degenerate (P=4) windows into
their own segments so the bulk of a CpG-calling workload runs at 2
path-lanes per read. It regressed the 64-problem bundled bench
(226k -> 187k ev/s) and was left default-off; this measures it at
batch sizes that actually fill its extra shape buckets — a synthetic
CpG workload of SPLIT_READS (default 512) reads through the REAL
production dispatch (run_alignment_batch, site-calling mode), split
on vs off.

Usage: SPLIT_READS=512 python scripts/measure_path_split.py
Prints one JSON line per configuration.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from signalalign_tpu.models.pore_model import PoreModel
    from signalalign_tpu.pipeline.runner import run_alignment_batch
    from signalalign_tpu.pipeline.signal_align import AlignmentConfig
    from signalalign_tpu.utils.synthetic import build_synthetic_batch

    n_reads = int(os.environ.get("SPLIT_READS", "512"))
    reps = int(os.environ.get("SPLIT_REPS", "3"))
    model = PoreModel.from_file(
        "/root/reference/models/testModelR9p4_5mer_acegt_template.model")
    # all-ambiguous: every read over the CpG-Y-edited reference --
    # sparse adjacent CpGs in random sequence give the natural P mix
    _, _, rgs, reference, _ = build_synthetic_batch(
        model, n_reads=n_reads, ev_min=800, ev_max=8000, seed=23,
        ambig_frac=1.0)
    ev = sum(r.events.shape[0] for r, _ in rgs)
    print(f"# {len(rgs)} reads, {ev} events", file=sys.stderr)

    for split in (False, True):
        cfg = AlignmentConfig(ambig_map={"Y": "CT"}, path_split=split)

        def run(r):
            batch = []
            for read, g in rgs:
                e = read.events.copy()
                e[:, 0] *= (1.0 + 1e-6 * r)
                batch.append((dataclasses.replace(read, events=e), g))
            res = run_alignment_batch(batch, reference, model, cfg,
                                      call_variants="CT")
            assert sum(len(x.variant_calls) for x in res
                       if x.variant_calls is not None) > 0
            return res

        run(0.37)     # compile + warm
        t0 = time.perf_counter()
        for i in range(reps):
            run(1.11 + i)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "path_split": split,
            "events_per_s": round(ev * reps / dt, 1),
            "reads": len(rgs), "events": ev,
            "wall_s_per_rep": round(dt / reps, 3)}))


if __name__ == "__main__":
    main()
