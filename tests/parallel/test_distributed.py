"""Real multi-process ``jax.distributed`` exercise (SURVEY §4 carry-over).

Spawns two CPU processes that initialise through
``parallel.distributed.initialize_distributed`` against a localhost
coordinator and reduce a host-local scalar with ``all_hosts_mean``; each
process must see process_count==2 and agree on the cross-host mean —
the actual multi-host code path, not the virtual single-process mesh.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_mean():
    addr = f"127.0.0.1:{_free_port()}"
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, addr, "2", str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    for pid, o in enumerate(outs):
        assert o["initialized"] is True
        assert o["process_count"] == 2
        assert o["process_index"] == pid
        # mean of host-local scalars 1.0 (proc 0) and 2.0 (proc 1)
        assert o["mean"] == pytest.approx(1.5)
