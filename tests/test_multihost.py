"""True multi-process jax.distributed test (VERDICT r1 item #3).

Launches 2 subprocesses that join one jax.distributed cluster over a
localhost coordinator, each contributing 2 CPU devices, and runs a DP-sharded
train step over the 4-device global mesh (child: tests/_multihost_child.py).
Asserts both processes complete and compute the SAME global loss — the
distributed analogue of the reference's MirroredStrategy reduction
(/root/reference/src/module/AE3D.py:92-104).
"""

from __future__ import annotations

import os
import re
import socket
import subprocess
import sys

import pytest

CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step(tmp_path):
    port = _free_port()
    env_base = {
        k: v
        for k, v in os.environ.items()
        # scrub inherited jax/xla pins so the children control their backends
        if not k.startswith(("JAX_", "XLA_"))
    }
    procs = []
    for pid in range(2):
        env = dict(
            env_base,
            COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
            MULTIHOST_CKPT_DIR=str(tmp_path),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, CHILD],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
    losses = []
    for out in outs:
        m = re.search(r"MULTIHOST_OK pid=\d+ loss=([\d.]+) loss2=([\d.]+)", out)
        assert m, out[-4000:]
        losses.append((float(m.group(1)), float(m.group(2))))
        # collective async checkpoint save + restore round-tripped on each host
        assert "MULTIHOST_CKPT_OK" in out, out[-4000:]
    # the psum'd global loss must be identical on every host
    assert losses[0] == pytest.approx(losses[1], abs=1e-5), losses
    # and training must actually move the loss between the two steps
    assert losses[0][0] != losses[0][1]
