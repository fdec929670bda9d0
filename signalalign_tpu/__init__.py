"""signalalign_tpu — a TPU-native nanopore signal-to-reference alignment engine.

A from-scratch re-design of the capabilities of UCSC-nanopore-cgl/signalAlign
(banded pair-HMM posterior decoding of ONT ionic-current events against a
reference k-mer sequence, HDP-mixture emissions for methylation calling, and
Baum-Welch/EM training) built on JAX/XLA/Pallas for TPU hardware.

Key architectural differences from the reference (C99 + subprocess pipelines):

* The banded forward-backward DP over (reference-kmer x event) cells
  (reference: impl/pairwiseAligner.c) is a fixed-shape band-tensor program
  swept along anti-diagonals with ``jax.lax.scan`` / Pallas, batched over
  many reads per chip.
* Emissions (Gaussian, inverse-Gaussian, HDP spline densities; reference:
  impl/stateMachine.c, impl/hdp.c) are vectorized table lookups + VPU math.
* Per-read process pools (reference: utils/multithread.py + signalMachine
  subprocesses) are replaced by device batching and ``jax.sharding`` data
  parallelism over a TPU mesh; EM expectation reduction (reference: per-read
  TSV files summed in Python) is an on-device ``psum``.
"""

__version__ = "0.1.0"

from signalalign_tpu.models.pore_model import PoreModel  # noqa: F401
