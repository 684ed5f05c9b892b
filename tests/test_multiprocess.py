"""True multi-process distributed execution over the Gloo CPU backend.

Spawns 2 worker processes, each with 4 virtual CPU devices, that together
form a (dp=2 processes over 'DCN') x (ep=4 'chips' over 'ICI') hybrid mesh
and run one sharded-state edge-partitioned training step
(parallel/edge_partition.py scheme 2). The workers assert loss parity with
the single-device reference internally; this test checks both processes
complete and agree. This is the multi-host execution path the reference
never had (its DataParallel is single-process threads,
/root/reference/ogbg-code/tg/data_parallel.py:41-82).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_ep_train_step():
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, worker, str(i), "2", str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"MP_OK {i}" in out, out[-2000:]
    # both report the identical (replicated) loss
    l0 = [ln for ln in outs[0].splitlines() if ln.startswith("MP_OK")][0]
    l1 = [ln for ln in outs[1].splitlines() if ln.startswith("MP_OK")][0]
    assert l0.split()[2] == l1.split()[2], (l0, l1)
