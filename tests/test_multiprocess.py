"""Real multi-process jax.distributed test (2 processes x 4 CPU devices).

The rest of the suite simulates a pod with ONE process and 8 virtual
devices; this test runs the actual multi-host mechanism — a coordinator,
two OS processes each owning 4 devices, one global mesh, cross-process
sharded inputs, and a cross-process allgather — against the numpy oracle.
This is the closest an 8-vCPU host gets to BASELINE's "N>=2 hosts" axis;
on a pod the same code path runs over DCN/ICI unchanged.
"""

import os
import socket
import subprocess
import sys

_WORKER = os.path.join(os.path.dirname(__file__), "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_scores():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count (4)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(_WORKER))),
        )
        for pid in range(2)
    ]
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((pid, p.returncode, out, err))
    for pid, rc, out, err in outs:
        assert rc == 0, f"worker {pid} rc={rc}\nstdout:\n{out}\nstderr:\n{err}"
        assert f"MP_OK {pid}" in out, f"worker {pid} missing MP_OK:\n{out}\n{err}"
