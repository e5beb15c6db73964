"""True multi-process `jax.distributed` test: two worker processes (2 virtual
CPU devices each) form a 4-device global mesh, solve a sharded LMPC scenario
batch with cross-process collectives (gloo), and must agree on the result.

This exercises the multi-host runtime path (`parallel/distributed.py`) that
scales the engine past one host — the role the ROS2 process topology plays
in the reference (SURVEY.md section 2.7), rebuilt as the single-controller
JAX multi-process model.
"""

import os
import re
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "multihost_worker.py")


def test_two_process_distributed_solve():
    # reserve a genuinely free port (a fixed pid-derived port can collide
    # with an occupied one and fail with an opaque worker error)
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    # the workers configure JAX_PLATFORMS/XLA_FLAGS themselves
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=840)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    checks = [re.search(
        r"MULTIHOST_OK pid=\d+ solved=([\d.]+) checksum=(-?[\d.]+) "
        r"min_cost=(-?[\d.]+) weakscale=([\d.]+) t_local_ms=([\d.]+) "
        r"t_global_ms=([\d.]+)", out) for out in outs]
    for pid, m in enumerate(checks):
        assert m, f"worker {pid} printed no MULTIHOST_OK:\n{outs[pid]}"
    # both processes must observe the same global reduction and solution
    assert checks[0].group(1) == checks[1].group(1)
    assert checks[0].group(2) == checks[1].group(2)
    assert checks[0].group(3) == checks[1].group(3)

    # record the live 2-process weak-scaling efficiency as a bench artifact
    # (BASELINE.md target: >= 90% at >= 2 hosts on real DCN; the CPU/gloo
    # harness number is noisy — record it, gate only against pathology)
    import json
    eff = min(float(m.group(4)) for m in checks)
    artifact = {
        "harness": "2-process jax.distributed (gloo, 2 virtual CPU devices "
                   "per process, tiny N=5/K=8 problem)",
        "weak_scaling_efficiency": eff,
        "per_process": [
            {"t_local_ms": float(m.group(5)), "t_global_ms": float(m.group(6)),
             "efficiency": float(m.group(4))} for m in checks],
        "target_real_hardware": 0.90,
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "WEAKSCALE.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    assert eff > 0.2, f"pathological multi-process overhead: {artifact}"
