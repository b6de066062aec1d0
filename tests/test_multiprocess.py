"""Real multi-process execution of the multi-host path (VERDICT r2 #2).

Spawns 2 OS processes that ``jax.distributed.initialize`` against a local
coordinator (CPU backend, 4 virtual devices each, Gloo collectives) and run
the ViT overfit trainer end-to-end with ``jax.process_count() == 2`` —
row-filtered loading, global-batch assembly across processes, psum-in-jit
gradient averaging — then asserts the loss trajectory equals a
single-process run of the same config bit-for-bit-close.

The in-process tests in test_multihost.py pin the degenerate single-process
contracts; THIS file is the one place the >1-process branch executes.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_multiprocess_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(tmp_path, n_procs: int, timeout: int = 600,
                 overrides: tuple = ()):
    """Launch n_procs workers; return their LOSSES lists."""
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = []
    for i in range(n_procs):
        wd = tmp_path / f"proc{i}"
        wd.mkdir(parents=True, exist_ok=True)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(wd), str(i), str(n_procs),
             str(port), *overrides],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    losses = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        line = [l for l in out.splitlines() if l.startswith("LOSSES ")]
        assert line, f"worker {i} printed no LOSSES:\n{out[-2000:]}"
        losses.append(json.loads(line[-1][len("LOSSES "):]))
    return losses


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    two = _run_workers(tmp_path / "mp", 2)
    # both processes see the same global loss (psum over the full mesh)
    assert len(two[0]) == len(two[1]) > 0
    np.testing.assert_allclose(two[0], two[1], rtol=1e-6)

    one = _run_workers(tmp_path / "sp", 1)[0]
    # same config, same seeds, same global batches → same trajectory.
    # CPU reassociation across a different device count allows tiny drift.
    assert len(one) == len(two[0])
    np.testing.assert_allclose(two[0], one, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_two_process_fsdp_matches_single_process(tmp_path):
    """ZeRO-3 across REAL processes: params + adam moments shard over the
    8-device data axis spanning both processes (GSPMD all-gathers cross the
    process boundary via Gloo), and the loss trajectory still equals the
    single-process FSDP run."""
    ov = ("training.fsdp=true", "training.fsdp_min_size=1")
    two = _run_workers(tmp_path / "mp", 2, overrides=ov)
    np.testing.assert_allclose(two[0], two[1], rtol=1e-6)
    one = _run_workers(tmp_path / "sp", 1, overrides=ov)[0]
    assert len(one) == len(two[0]) > 0
    np.testing.assert_allclose(two[0], one, rtol=2e-4, atol=2e-5)
