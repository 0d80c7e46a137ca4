"""Multi-chip collective contract, pinned from compiled HLO.

VERDICT r4 item 6: the rebuild's distinctive claim is that ICI collectives
replace the reference's LCM multicast (SURVEY §2.6) — so the collective
count/bytes of each layout is a contract, not an implementation detail.
These tests compile the real programs on the virtual 8-device CPU mesh
(conftest) and parse the HLO:

- frame-sharded window LM (parallel/sharded_window.py): exactly
  2 collective-permutes (packed halo; packed boundary+B_left), 2
  all-gathers (poses for loop endpoints; fused SPIKE tips), 1 grouped
  all-reduce (Woodbury capacitance + cost) per iteration — fused down
  from 11 in round 4 (COMM_MODEL.json r4: 7 permutes + 3 gathers).
- fleet batch-axis layout (parallel/swarm_batch.py): ZERO data
  collectives; the only collective is the 1-byte convergence flag of the
  lock-step while-loop.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tools")

from comm_model import fleet_hlo, hlo_collectives, sharded_iter_hlo


def _counts(colls):
    out = {}
    for op, b in colls:
        st = out.setdefault(op, [0, 0])
        st[0] += 1
        st[1] += b
    return out


@pytest.fixture(scope="module")
def frame_sharded():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    hlo, meta = sharded_iter_hlo(64, 4, 8)
    return hlo_collectives(hlo), meta


def test_frame_sharded_collective_count(frame_sharded):
    colls, _ = frame_sharded
    c = _counts(colls)
    assert c.get("collective-permute", [0])[0] == 2, c
    assert c.get("all-gather", [0])[0] == 2, c
    assert c.get("all-reduce", [0])[0] == 1, c
    assert len(colls) == 5, c


def test_frame_sharded_collective_bytes(frame_sharded):
    """Payloads match the analytic model: the all-reduce carries the
    (C+1, C+1)-ish capacitance reduction, the all-gathers the poses and
    fused SPIKE tips — nothing hidden grew."""
    colls, meta = frame_sharded
    F, D, C = meta["F"], meta["D"], meta["woodbury_cols"]
    m, P = 4 * D, 8
    c = _counts(colls)
    # all-reduce: S_part (C, C) + Uyb (C) + cost scalars, f32
    ar_expect = 4 * (C * C + C)
    assert abs(c["all-reduce"][1] - ar_expect) <= ar_expect * 0.2 + 256, (
        c["all-reduce"][1], ar_expect)
    # all-gathers: poses (F, D, 4) + packed tips (P*(4mm + 2m(1+C)))
    ag_expect = 4 * (F * D * 4) + 4 * P * (4 * m * m + 2 * m * (1 + C))
    assert abs(c["all-gather"][1] - ag_expect) <= ag_expect * 0.25 + 512, (
        c["all-gather"][1], ag_expect)
    # permutes are small halo/boundary payloads
    assert c["collective-permute"][1] < 64 * 1024, c


def test_fleet_layout_zero_data_collectives():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    colls = hlo_collectives(fleet_hlo(8))
    data = [(op, b) for op, b in colls if b > 16]
    assert data == [], data
    # lock-step convergence flag only
    assert len(colls) <= 2, colls
