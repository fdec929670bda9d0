"""Multi-host scaffolding: 2 simulated processes on CPU run the SAME
host-sharded EM program a TPU pod would (jax.distributed + global mesh +
cross-host psum), and agree on the replicated result (VERDICT r1 item 5).
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["SA_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

from signalalign_tpu.parallel import multihost

pid = int(os.environ["SIGNALALIGN_PROC"])
multihost.initialize()   # from SIGNALALIGN_* env
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import numpy as np
from signalalign_tpu.ops import banded_fb as bfb
from signalalign_tpu.ops.batch import stack_kmer_ids, stack_problems
from signalalign_tpu.models.pore_model import PoreModel, ScalingParams
from signalalign_tpu.utils.alphabet import DEFAULT_AMBIG_BASES

# per-host reads: each host preps ONLY its shard (host-local input IO)
model = PoreModel("ACGT", 5)
K = model.alphabet.num_kmers
mrng = np.random.default_rng(0)
model.level_mean = np.linspace(60.0, 120.0, K) + mrng.normal(0, 2.0, K)
model.level_sd = np.full(K, 1.5)
model.noise_mean = np.full(K, 1.0)
model.noise_sd = np.full(K, 0.2)
model.noise_lambda = model.noise_mean ** 3 / model.noise_sd ** 2
all_reads = list(range(8))
mine = multihost.host_shard(all_reads)
assert len(mine) == 4
problems = []
for ridx in mine:
    rng = np.random.default_rng(100 + ridx)   # read identity, not host
    seq = "".join(rng.choice(list("ACGT"), size=40))
    ids = model.alphabet.seq_to_kmer_ids(seq)
    ev = np.stack([model.level_mean[ids] + rng.normal(0, 1.0, len(ids)),
                   np.ones(len(ids)), np.full(len(ids), .01),
                   np.arange(len(ids)) * .01], 1)
    problems.append(bfb.prepare_problem(
        seq, ev, model, ScalingParams(), DEFAULT_AMBIG_BASES,
        W=48, Dpad=128, P=1, mode=bfb.MODE_MEAN_ONLY, expansion=8))
local = tuple(stack_problems(problems)) + (stack_kmer_ids(problems),)

mesh = multihost.global_mesh()
new_trans, lik, totals, kexp = multihost.em_train_step_multihost(
    mesh, local, W=48, P=1, mode=bfb.MODE_MEAN_ONLY, num_kmers=K)

# the host-orchestrated EM path (pipeline.train em_train cross_host) sums
# per-host expectation tensors with process_allgather — validate that API
import jax.numpy as jnp
from jax.experimental import multihost_utils
g = np.asarray(multihost_utils.process_allgather(
    jnp.asarray(np.array([float(pid + 1)]))))
assert sorted(g.reshape(-1).tolist()) == [1.0, 2.0], g
new_trans = np.asarray(new_trans)
lik = float(np.asarray(lik))
kmass = float(np.asarray(kexp)[0].sum())
print(f"RESULT {pid} {lik:.6f} {kmass:.6f} "
      + ",".join(f"{v:.8f}" for v in new_trans.reshape(-1)), flush=True)
"""


def test_two_process_cpu_em(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "SA_REPO": REPO,
            "SIGNALALIGN_COORD": f"127.0.0.1:{port}",
            "SIGNALALIGN_NPROC": "2",
            "SIGNALALIGN_PROC": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_PLATFORMS": "cpu",
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append([ln for ln in out.splitlines()
                     if ln.startswith("RESULT")][0].split())
    # replicated results identical across hosts (the psum crossed DCN)
    assert outs[0][2:] == outs[1][2:], (outs[0], outs[1])
    lik = float(outs[0][2])
    assert np.isfinite(lik) and lik < 0
    assert float(outs[0][3]) > 0          # emission posterior mass
    trans = np.array([float(v) for v in outs[0][4].split(",")]).reshape(3, 3)
    rows = trans.sum(axis=1)
    assert np.allclose(rows[rows > 0], 1.0, rtol=1e-4)


INFER_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["SA_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

from signalalign_tpu.models.pore_model import PoreModel
from signalalign_tpu.pipeline.runner import run_signal_align

ONED = "/root/reference/tests/minion_test_reads/1D"
written = run_signal_align(
    alignment_file=os.path.join(ONED, "1D.bam"),
    readdb=os.path.join(ONED, "1D.fastq.index.readdb"),
    fast5_dirs=[ONED],
    reference_fasta=os.environ["SA_FASTA"],
    model=PoreModel.from_file(
        "/root/reference/models/testModelR9p4_5mer_acegt_template.model"),
    output_dir=os.environ["SA_OUT"],
    output_format="full", max_reads=2, verbose=False,
    distributed=True)
print("WROTE " + str(len(written)), flush=True)
"""


def test_two_process_cpu_inference(tmp_path, ecoli_fasta):
    """`run_signal_align(distributed=True)` under 2 CPU processes: the
    read list host-shards, each process writes only its shard, and the
    union of TSVs matches the single-process run byte-for-byte
    (VERDICT r2 item 6)."""
    import glob

    from signalalign_tpu.models.pore_model import PoreModel
    from signalalign_tpu.pipeline.runner import run_signal_align

    oned = "/root/reference/tests/minion_test_reads/1D"
    single_dir = tmp_path / "single"
    run_signal_align(
        alignment_file=os.path.join(oned, "1D.bam"),
        readdb=os.path.join(oned, "1D.fastq.index.readdb"),
        fast5_dirs=[oned], reference_fasta=ecoli_fasta,
        model=PoreModel.from_file(
            "/root/reference/models/testModelR9p4_5mer_acegt_template"
            ".model"),
        output_dir=str(single_dir), output_format="full", max_reads=2,
        verbose=False)
    single = {os.path.basename(p) for p in glob.glob(str(single_dir / "*"))}
    assert len(single) == 2

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "infer_worker.py"
    script.write_text(INFER_WORKER)
    dist_dir = tmp_path / "dist"
    os.makedirs(dist_dir)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "SA_REPO": REPO,
            "SA_FASTA": ecoli_fasta,
            "SA_OUT": str(dist_dir),
            "SIGNALALIGN_COORD": f"127.0.0.1:{port}",
            "SIGNALALIGN_NPROC": "2",
            "SIGNALALIGN_PROC": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_PLATFORMS": "cpu",
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    n_written = 0
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        n_written += int([ln for ln in out.splitlines()
                          if ln.startswith("WROTE")][0].split()[1])
    # each read written by exactly one host; union == single-process
    assert n_written == 2
    dist = {os.path.basename(p) for p in glob.glob(str(dist_dir / "*"))}
    assert dist == single
    for name in sorted(single):
        a = open(single_dir / name).read()
        b = open(dist_dir / name).read()
        assert a == b, f"{name} differs between single and distributed"
