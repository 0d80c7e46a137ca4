"""Data-association initializer tests."""
import numpy as np

from omniswarm_tpu.robust.da_init import (
    ANONYMOUS_ID_BASE,
    rewrite_detections,
    try_data_association,
)


class Det:
    def __init__(self, a, b, direction, inv_dep):
        self.drone_a = a
        self.drone_b = b
        self.direction = np.asarray(direction, float)
        self.inv_dep = float(inv_dep)


def make_scene(rng, n_drones=4):
    poses = {}
    for d in range(n_drones):
        p = np.concatenate([rng.uniform(-5, 5, 3), rng.uniform(-3, 3, 1)])
        poses[d] = p
    return poses


def bearing(poses, a, b, noise=0.0, rng=None):
    pa, pb = poses[a], poses[b]
    c, s = np.cos(-pa[3]), np.sin(-pa[3])
    d = pb[:3] - pa[:3]
    rel = np.array([c * d[0] - s * d[1], s * d[0] + c * d[1], d[2]])
    n = np.linalg.norm(rel)
    u = rel / n
    if noise and rng is not None:
        u = u + rng.normal(0, noise, 3)
        u /= np.linalg.norm(u)
    return u, 1.0 / n


def test_da_assigns_correctly(rng):
    poses = make_scene(rng)
    # drone 0 sees drones 1 and 2 anonymously
    u1, id1 = bearing(poses, 0, 1, noise=0.005, rng=rng)
    u2, id2 = bearing(poses, 0, 2, noise=0.005, rng=rng)
    dets = [Det(0, ANONYMOUS_ID_BASE + 7, u1, id1),
            Det(0, ANONYMOUS_ID_BASE + 8, u2, id2)]
    mapping = try_data_association(dets, poses)
    assert mapping == {ANONYMOUS_ID_BASE + 7: 1, ANONYMOUS_ID_BASE + 8: 2}
    n = rewrite_detections(dets, mapping)
    assert n == 2 and dets[0].drone_b == 1 and dets[1].drone_b == 2


def test_da_rejects_inconsistent(rng):
    poses = make_scene(rng)
    # bearing pointing away from every other drone
    u = np.array([0.0, 0.0, 1.0])
    dets = [Det(0, ANONYMOUS_ID_BASE + 1, u, 5.0)]
    mapping = try_data_association(dets, poses)
    assert mapping is None


def test_da_injective_assignment(rng):
    poses = make_scene(rng, n_drones=3)
    # two anonymous ids both look like drone 1 from different observers —
    # injectivity forces one of them elsewhere or failure
    u1, id1 = bearing(poses, 0, 1)
    u2, id2 = bearing(poses, 2, 1)
    dets = [Det(0, ANONYMOUS_ID_BASE + 1, u1, id1),
            Det(2, ANONYMOUS_ID_BASE + 2, u2, id2)]
    mapping = try_data_association(dets, poses)
    if mapping is not None:
        assert len(set(mapping.values())) == len(mapping)


def test_da_no_anonymous_returns_none(rng):
    poses = make_scene(rng)
    u, idep = bearing(poses, 0, 1)
    mapping = try_data_association([Det(0, 1, u, idep)], poses)
    assert mapping is None
