"""Checkpoint save/restore under a MULTI-PROCESS sharded mesh.

Round 4 left `_to_host` device_get-ting every leaf, which raises on
non-fully-addressable arrays (a TP/multislice mesh spanning processes).
The fix gathers with ``process_allgather`` and writes from process 0
behind a barrier; this test proves it with 2 real ``jax.distributed``
CPU processes (gloo) sharing one checkpoint dir — save from a TP-sharded
state, byte-exact restore, resume on a different mesh shape.  The
single-process sharded case is tests/test_checkpoint.py::
test_checkpoint_roundtrip_tp_sharded.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiproc_ckpt_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_checkpoint_roundtrip(tmp_path):
    port = _free_port()
    ckpt_dir = str(tmp_path / "ckpt")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        env.update({
            "JAX_PLATFORMS": "cpu",
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, ckpt_dir],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT))
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        assert p.returncode == 0, out.decode()[-4000:]
        assert b"ckpt roundtrip ok" in out, out.decode()[-2000:]
