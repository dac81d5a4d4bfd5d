"""Real multi-process jax.distributed path over CPU (VERDICT r1 item 5).

Spawns TWO OS processes, each with 4 virtual CPU devices, joined by
``jax.distributed.initialize`` into one 8-device job, and drives
``distributed.sweep`` over the global mesh. Both processes must print the
identical psum-reduced summary, and it must equal the single-process
8-device run of the same sweep (computed in this parent, which conftest
already gives 8 virtual devices).
"""
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from scp_tpu.parallel import distributed
from scp_tpu.scenarios import batch as batch_lib

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sweep_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # worker sets its own device count (4)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [env.get("PYTHONPATH", ""),
                    os.path.dirname(os.path.dirname(__file__))] if p)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        lines = [l for l in out.splitlines() if l.startswith("SUMMARY")]
        assert lines, f"no SUMMARY line:\n{out}\n{err[-2000:]}"
        outs.append(lines[-1])

    assert outs[0] == outs[1], "processes disagree on the psum'd summary"
    got = np.array([float(v) for v in outs[0].split()[1:]])

    # single-process reference on this parent's 8 virtual devices
    cfg, data = batch_lib.make_batch("circle", 16, key=jax.random.PRNGKey(5),
                                     dtype=jnp.float64, n_veh=3)
    cfg = cfg.replace(hp=5, hu=5, max_scp_iter=2, qp_max_iter=8)
    mesh = distributed.global_mesh()
    _, summary = distributed.sweep(cfg, data, mesh, n_steps=2)
    want = np.concatenate([np.asarray(s, float) for s in summary])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_two_process_checkpoint_resume(tmp_path):
    """Per-process shard checkpoints in a REAL 2-process job (VERDICT r2
    item 5): kill after 3 of 6 steps, resume, final carry bitwise equal to
    the uninterrupted run — asserted inside each worker on its addressable
    shard blocks."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [env.get("PYTHONPATH", ""),
                    os.path.dirname(os.path.dirname(__file__))] if p)
    path = str(tmp_path / "mh_ckpt.npz")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(port), str(pid), "ckpt", path],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for pid in range(2)
    ]
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        assert "CKPT_OK" in out, f"no CKPT_OK:\n{out}\n{err[-2000:]}"
    # both per-process shard files exist
    from scp_tpu.utils import checkpoint as ckpt_lib
    for pid in range(2):
        assert os.path.exists(ckpt_lib.proc_path(path, pid))
