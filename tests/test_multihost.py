"""Multi-host layer: 2 localhost CPU processes, gloo collectives
(VERDICT r2 #4). Each worker asserts the sharded-engine collective set
(psum / tiled all_gather / axis_index owned-row broadcast) and a
cross-process sharded NJ against the NumPy oracle."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_collectives_and_nj(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets its own
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(worker)),
         env.get("PYTHONPATH", "")])
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{err[-3000:]}"
    assert (tmp_path / "ok").exists()
