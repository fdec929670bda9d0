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

import os as _os

# Raise the TPU compiler's scoped-VMEM ceiling (default 16MB of the v5e's
# 128MB physical VMEM): the W=768/1024 lane-batched wavefront kernels keep
# ~20-26MB of ring + window state resident. Must be set before libtpu
# initializes; appended so user-provided args win.
_largs = _os.environ.get("LIBTPU_INIT_ARGS", "")
if "xla_tpu_scoped_vmem_limit_kib" not in _largs:
    _os.environ["LIBTPU_INIT_ARGS"] = \
        ("--xla_tpu_scoped_vmem_limit_kib=65536 " + _largs).strip()

# Persistent XLA compilation cache: kernel shapes are bucketed, so across
# runs the same executables recur; caching them on disk removes the
# dominant cold-start cost (remote TPU compilation). Opt out with
# SIGNALALIGN_TPU_NO_COMPILE_CACHE=1.

if not _os.environ.get("SIGNALALIGN_TPU_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        _cache = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/signalalign_tpu/xla"))
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
