"""True multi-process decentralization: N OS processes over UDP multicast.

Each drone runs in its own Python process (tools/drone_process.py) with its
own estimator/detector, exchanging keyframes and loop edges exclusively via
real multicast datagrams — the full hardware deployment shape, minus radios.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from omniswarm_tpu import sim
from omniswarm_tpu.eval import metrics

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_swarm(tmp_path):
    D, F = 2, 16
    data = sim.generate(sim.SimParams(
        num_drones=D, num_frames=F, seed=55,
        radius_range=(2.0, 4.0)))
    scenario = tmp_path / "scenario.npz"
    np.savez(scenario, gt=data.gt, vio=data.vio, ranges=data.ranges,
             range_valid=data.range_valid, times=data.times,
             world_seed=np.asarray(7))

    procs = []
    outs = []
    for d in range(D):
        out = tmp_path / f"out{d}.npz"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "drone_process.py"),
             "--scenario", str(scenario), "--drone-id", str(d),
             "--out", str(out), "--port", "17801", "--step-wall", "0.12"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    for p in procs:
        stdout, _ = p.communicate(timeout=300)
        assert p.returncode == 0, stdout[-2000:]

    total_recv = 0
    for d, out in enumerate(outs):
        raw = np.load(out)
        if not bool(raw["solved"]):
            continue
        est = raw["estimate"]
        kf_idx = [int(round(t)) for t in raw["kf_times"]]
        gt = data.gt[kf_idx]
        rel = metrics.mean_relative_ate(est, gt)
        assert rel < 0.3, (d, rel)
        total_recv += int(raw["loops_received"]) + int(raw["loops_found"])
    # at least one process solved, and loop edges crossed process boundaries
    solved = [bool(np.load(o)["solved"]) for o in outs]
    assert any(solved), solved
    assert total_recv > 0
