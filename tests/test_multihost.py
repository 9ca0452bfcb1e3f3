"""Multi-host (multi-process) path: 2 real ``jax.distributed`` CPU
processes exercise ``parallel/multihost.py`` end-to-end and must agree
with the single-process result.

The reference's analog is its runtime-skipping P2P/MPI tests
(``tests/test_p2p.cpp:154`` pattern: skip when the fabric is absent,
run for real when it is). Here the fabric is always constructible — a
localhost coordinator and two subprocesses with 2 virtual CPU devices
each (4 global devices).
"""
import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    import numpy as np
    import jax
    import jax.numpy as jnp

    # TPU plugins (axon) ignore JAX_PLATFORMS; the config update is
    # honored even then (same workaround as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    coord, pid, outfile = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    from nvmolkit_tpu.parallel import multihost

    distributed = multihost.initialize(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    assert distributed, "2-process init must report distributed"
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # 2 virtual CPU devices per process

    mesh = multihost.global_mesh()
    n_total = 12
    start, end = multihost.local_rows(n_total)
    # deterministic global data: row i = i + arange(8)
    local = (
        np.arange(start, end, dtype=np.float32)[:, None]
        + np.arange(8, dtype=np.float32)[None, :]
    )
    x = multihost.global_array(local, n_total, mesh)
    assert x.shape == (n_total, 8)

    # a sharded computation with a cross-row collective: row sums plus
    # the global mean (psum over the mesh via jnp.mean under jit)
    @jax.jit
    def f(a):
        return a.sum(axis=1) + a.mean()

    y = f(x)
    gathered = multihost.all_gather_rows(y)
    if pid == 0:
        json.dump({"y": gathered.tolist()}, open(outfile, "w"))
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_matches_single(tmp_path: Path):
    repo = Path(__file__).resolve().parents[1]
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    out = tmp_path / "out.json"
    coord = f"localhost:{_free_port()}"

    env = dict(os.environ)
    env["PYTHONPATH"] = f"{repo}{os.pathsep}" + env.get("PYTHONPATH", "")
    # the workers set their own JAX_PLATFORMS/XLA_FLAGS
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(pid), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=280)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log}"

    got = np.asarray(json.loads(out.read_text())["y"], np.float32)
    # single-process oracle
    n_total = 12
    data = (
        np.arange(n_total, dtype=np.float32)[:, None]
        + np.arange(8, dtype=np.float32)[None, :]
    )
    want = data.sum(axis=1) + data.mean()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_single_process_helpers_are_noops():
    """Off-pod the helpers must behave as plain single-host ops."""
    import jax

    from nvmolkit_tpu.parallel import multihost

    assert multihost.initialize() is False  # single process
    mesh = multihost.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    start, end = multihost.local_rows(16)
    assert (start, end) == (0, 16)
    local = np.arange(32, dtype=np.float32).reshape(16, 2)
    x = multihost.global_array(local, 16, mesh)
    np.testing.assert_array_equal(multihost.all_gather_rows(x), local)
