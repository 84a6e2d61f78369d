"""Multi-process (2-host-emulation) distributed tests.

Two real OS processes run jax.distributed against a shared coordinator
with 2 virtual CPU devices each (global mesh = 4); the worker proves a
data-parallel gradient step over the global mesh matches single-device
(tests/distributed_worker.py), plus unit tests of the per-host data
sharding helpers.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_step_matches_single_device(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    out = str(tmp_path / "result.txt")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, str(i), "2", out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outputs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=480)
            outputs.append(stdout.decode(errors="replace"))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out")
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{text[-4000:]}"
    with open(out) as f:
        assert f.read() == "PASS"


def test_shard_filelist_single_host():
    from vocal_remover_tpu.parallel import distributed

    files = list(range(7))
    assert distributed.shard_filelist(files) == files  # 1 host: identity


def test_host_seed_single_host():
    from vocal_remover_tpu.parallel import distributed

    assert distributed.host_seed(3) == 3 * 1_000_003
