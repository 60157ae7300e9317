"""Multi-host training launcher validated with a real 2-process CPU group
(gloo collectives): dp mesh spanning processes, per-process local batch
feeding via make_array_from_process_local_data, cross-host grad mean.

Covers the reference's multi-node surface (main.py:18-19,59) — SURVEY §5.8.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_step():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # children configure their own platform/devices; scrub pytest's setup
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "insv2v_tpu.parallel.multihost_check",
             str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=1800)  # cold compile cache:
                # two children share one CPU (per-host cache subdirs
                # recompile once after a host change)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost processes timed out")
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err}"
        outs.append(out)
    losses = set()
    for out in outs:
        line = [ln for ln in out.splitlines() if "MULTIHOST_OK" in ln]
        assert line, out
        losses.add(line[0].split("loss=")[1])
    # both processes computed the same globally-reduced loss
    assert len(losses) == 1, losses
