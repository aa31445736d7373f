"""Multi-host gather semantics on a real 2-process CPU jax.distributed
runtime (VERDICT r1 item 6): test predictions are unioned across processes
before writing/evaluating, and only process 0 writes output files.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_prediction_gather(tmp_path):
    port = _free_port()
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               PYTHONPATH=REPO)
    worker = os.path.join(REPO, "tests", "_mp_gather_worker.py")
    procs = [
        subprocess.Popen([sys.executable, worker, str(port), str(pid),
                          str(tmp_path)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    # single writer: exactly the primary's file exists, with the full union
    path = tmp_path / "prediction_test_0.json"
    assert path.exists()
    merged = json.loads(path.read_text())
    assert sorted(int(k) for k in merged) == list(range(9))
    assert merged["7"]["prediction"] == [["tok7a"], ["tok7b"]]
