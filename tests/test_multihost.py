"""The multi-process (jax.distributed / DCN-path) smoke test.

Spawns two localhost processes, each with 4 virtual CPU devices, that join
one ``jax.distributed`` job and run a sharded training chunk over the GLOBAL
8-device mesh — so ``multihost_init``'s real initialization path (not its
single-process early return) and cross-process gloo collectives execute.
The reference's multi-rank scheduler ran on a real SLURM cluster
(``scheduler.py:140-169``); this is the in-tree equivalent exercise.
"""

import os
import socket
import subprocess
import sys

import pytest

HAVE_REF = os.path.isdir("/root/reference")
SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts", "multihost_smoke.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_two_process_distributed_chunk():
    port = _free_port()
    env = dict(os.environ)
    # children choose their own platform/device flags; scrub the test
    # harness's so they don't double-apply
    env.pop("XLA_FLAGS", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                SCRIPT,
                "--process-id",
                str(pid),
                "--num-processes",
                "2",
                "--port",
                str(port),
                "--steps",
                "20",
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"proc failed:\n{out[-3000:]}"
    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert len(lines) == 1, out[-3000:]
        losses.append(float(lines[0].split("loss=")[1]))
    # the loss is replicated across the distributed program: exact agreement
    assert losses[0] == losses[1], losses
