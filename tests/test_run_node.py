"""run_node.py end-to-end over stdin/stdout JSON lines."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from omniswarm_tpu import sim
from omniswarm_tpu.config import SwarmConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_config_yaml_roundtrip(tmp_path):
    cfg = SwarmConfig.from_yaml(os.path.join(REPO, "configs", "swarm5.yaml"))
    assert cfg.self_id == 0
    assert cfg.solver.max_frame_number == 100
    assert cfg.nodes[4].is_static and not cfg.nodes[4].has_vo
    assert cfg.nodes[0].antenna_pos == (0.0, 0.0, 0.1)
    out = tmp_path / "cfg.yaml"
    cfg.to_yaml(str(out))
    cfg2 = SwarmConfig.from_yaml(str(out))
    assert cfg2.solver.max_frame_number == 100


@pytest.mark.slow
def test_run_node_process(tmp_path):
    data = sim.generate(sim.SimParams(num_drones=3, num_frames=20, seed=99))
    # config with gates suitable for the sim scale
    cfgp = tmp_path / "cfg.yaml"
    cfgp.write_text("""
self_id: 0
solver: {init_z_movement: 0.05, pcm_redundant: true, max_iterations: 40,
         force_freq: 0.1}
""")
    lines = []
    for k in range(20):
        t = float(data.times[k])
        vio = {str(d): [float(x) for x in data.vio[k, d]] for d in range(3)}
        ranges = [[a, b, float(data.ranges[k, a, b])]
                  for a in range(3) for b in range(3)
                  if a != b and data.range_valid[k, a, b]]
        lines.append(json.dumps(
            {"type": "frame", "t": t, "vio": vio, "ranges": ranges}))
        lines.append(json.dumps(
            {"type": "vio", "t": t,
             "pose": [float(x) for x in data.vio[k, 0]]}))
    lines.append(json.dumps({"type": "quit"}))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_node.py"),
         "--config", str(cfgp), "--no-udp"],
        input="\n".join(lines), capture_output=True, text=True,
        timeout=600, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    outs = [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]
    solves = [o for o in outs if o.get("type") == "solve"]
    predicts = [o for o in outs if o.get("type") == "predict"]
    assert any(s.get("solved") for s in solves), solves
    assert predicts, "no prediction outputs emitted"
    # predictions carry all drones
    assert len(predicts[-1]["poses"]) == 3
