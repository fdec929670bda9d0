import os

# Run unit tests on a virtual multi-device CPU mesh so sharding logic is
# exercised without TPU hardware. Must be set before jax import and must
# OVERRIDE the ambient JAX_PLATFORMS (which points at the real TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin force-prepends itself to jax_platforms at import time,
# overriding the env var; pin the config explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# signalalign_tpu/__init__ turns on the persistent compilation cache
# (wanted on TPU: remote compiles are the cold-start cost). Serializing
# CPU executables through it segfaults on this jaxlib (observed:
# put_executable_and_time -> executable.serialize() SIGSEGV killing the
# whole pytest run). CPU compiles are cheap — keep it off for tests.
os.environ["SIGNALALIGN_TPU_NO_COMPILE_CACHE"] = "1"
jax.config.update("jax_enable_compilation_cache", False)
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference checkout not available")
    return REFERENCE_DIR


@pytest.fixture(scope="session")
def ecoli_fasta(tmp_path_factory):
    """Reconstruct the E. coli reference windows covered by the bundled 1D
    test BAM (the genome fasta itself is not shipped in the reference
    snapshot; MD tags let us rebuild the exact aligned windows)."""
    from signalalign_tpu.io.sam import read_bam, reconstruct_reference_window

    bam = os.path.join(REFERENCE_DIR, "tests/minion_test_reads/1D/1D.bam")
    refs, records = read_bam(bam)
    genome = np.full(4641652, ord("A"), dtype=np.uint8)
    for rec in records:
        window = reconstruct_reference_window(rec)
        assert window is not None
        genome[rec.pos:rec.pos + len(window)] = np.frombuffer(
            window.encode("latin-1"), dtype=np.uint8)
    path = tmp_path_factory.mktemp("ref") / "ecoli_reconstructed.fa"
    with open(path, "w") as fh:
        fh.write(">gi_ecoli\n")
        s = genome.tobytes().decode("latin-1")
        for i in range(0, len(s), 10000):
            fh.write(s[i:i + 10000] + "\n")
    return str(path)


import numpy as np  # noqa: E402


# ---------------------------------------------------------------------------
# Suite hygiene + tiers
# ---------------------------------------------------------------------------

@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop jax's in-process caches after every test module.

    A full single-process `pytest tests/` run reproducibly stalled in a
    late XLA CPU compile (test_twod via banded_fb.run_banded_fb) after
    ~137 tests: state accumulated across ~hundreds of compiles (live
    executables + tracing caches + RSS) made one late compile blow up.
    Clearing between modules keeps the process near a fresh-start
    profile; per-module recompiles are cheap on CPU.
    """
    yield
    jax.clear_caches()


# Fast tier: `pytest -m fast` runs the quick pure-host/unit modules
# (< ~3 min total); `-m "not slow"` is the default CI tier; no marker
# runs everything. Module-level marking keeps the tier list in one
# place.
_FAST_MODULES = {
    "test_compare", "test_expectations", "test_io", "test_mixture",
    "test_multiple_aligner", "test_pore_model", "test_visualization",
    "test_mea_variants", "test_event_align", "test_embed",
    "test_minialign", "test_scan",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _FAST_MODULES and "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)
