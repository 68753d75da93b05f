"""2-process jax.distributed CPU simulation (SURVEY.md §4's prescribed
multi-node test pattern): actually EXECUTES parallel/multihost.py's
initialize + slice-mesh + collective layout across two OS processes."""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_runtime():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "_multihost_worker.py")
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", addr],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
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
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    for pid, o in enumerate(sorted(outs, key=lambda d: d["pid"])):
        assert o["pid"] == pid
        assert o["process_count"] == 2
        assert o["device_count"] == 8
        # sum of 0..7 across the full (dcn, ici) mesh
        assert o["psum_total"] == 28.0
        # ICI-axis camera-block reduction is exact and replicated
        assert o["cam_block_err"] == 0.0
    # both processes computed identical replicated results
    assert outs[0]["psum_total"] == outs[1]["psum_total"]
