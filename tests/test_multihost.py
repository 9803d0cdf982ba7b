"""2-process jax.distributed CPU rung (SURVEY.md §4): two worker processes
each contribute 4 virtual devices; the sharded BA and matcher run over the
global 8-device mesh, so their collectives cross the process boundary —
exactly the multi-host (DCN) topology, minus the network."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_ba_and_matching():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" +
                    "\n".join(o or "" for o in outs))
    rcs = [p.returncode for p in procs]
    if any(rc == 3 for rc in rcs):
        pytest.skip("jax.distributed CPU collectives unavailable:\n" +
                    outs[0][-500:])
    for rc, out in zip(rcs, outs):
        assert rc == 0, out[-3000:]
        assert "MULTIHOST_OK" in out, out[-3000:]
    # Both processes agree on the replicated cost.
    costs = [ln.split("cost=")[1] for out in outs
             for ln in out.splitlines() if "MULTIHOST_OK" in ln]
    assert len(costs) == 2 and costs[0] == costs[1], costs
