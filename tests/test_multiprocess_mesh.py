"""Multi-PROCESS mesh: the shuffle/broadcast/psum collectives crossing a
real process boundary (jax.distributed + Gloo over localhost), not just the
single-process 8-virtual-device mesh — the closest DCN evidence a
single-host environment allows (SURVEY §2d-2/§5 distributed comm backend;
reference transport: Spark BlockManager/netty between executors)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_exchange_broadcast_psum():
    port = _free_port()
    child = os.path.join(os.path.dirname(__file__), "_mp_child.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # child sets its own device count
    procs = [subprocess.Popen([sys.executable, child, str(i), str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"MP_OK {i}" in out
