"""PCM outlier rejection + native max-clique tests."""
import numpy as np
import pytest

from omniswarm_tpu import sim
from omniswarm_tpu.eval import metrics
from omniswarm_tpu.robust import loopset_from_measurements, pcm_filter
from omniswarm_tpu.runtime.native import max_clique, _max_clique_numpy
from omniswarm_tpu.solver import lm_solve


def make_adj(n, clique_idx):
    adj = np.zeros((n, n), bool)
    for i in clique_idx:
        for j in clique_idx:
            if i != j:
                adj[i, j] = True
    return adj


def test_max_clique_planted():
    rng = np.random.default_rng(0)
    n = 40
    planted = [3, 7, 11, 19, 23, 31, 37]
    adj = make_adj(n, planted)
    # sprinkle random edges that don't form bigger cliques
    for _ in range(60):
        i, j = rng.integers(0, n, 2)
        if i != j and not (i in planted and j in planted):
            adj[i, j] = adj[j, i] = True
    found = max_clique(adj)
    assert set(found) >= set(planted) or len(found) >= len(planted)


def test_max_clique_matches_fallback_scale():
    rng = np.random.default_rng(1)
    n = 60
    adj = rng.uniform(size=(n, n)) < 0.3
    adj = adj | adj.T
    np.fill_diagonal(adj, False)
    c_native = max_clique(adj)
    c_np = _max_clique_numpy(adj)
    # both must return actual cliques
    for c in (c_native, c_np):
        for i in c:
            for j in c:
                if i != j:
                    assert adj[i, j]
    assert len(c_native) >= len(c_np) - 1


def test_max_clique_empty_and_single():
    assert max_clique(np.zeros((0, 0), bool)).size == 0
    assert max_clique(np.zeros((1, 1), bool)).tolist() == [0]


@pytest.fixture(scope="module")
def noisy_sim():
    params = sim.SimParams(num_drones=4, num_frames=40, seed=11,
                           loop_outlier_rate=0.25, loop_outlier_mag=4.0,
                           loop_every=2)
    return sim.generate(params)


def test_pcm_separates_outliers(noisy_sim):
    data = noisy_sim
    loops = loopset_from_measurements(data.loops)
    res = pcm_filter(loops, data.vio, pcm_thres=2.0)
    labels = np.array([lp.is_outlier for lp in data.loops])
    n_out = labels.sum()
    assert n_out >= 3, "fixture should contain outliers"
    # recall: most inliers kept
    kept_inliers = (res.good_mask & ~labels).sum() / max((~labels).sum(), 1)
    # precision: most outliers dropped
    dropped_outliers = (~res.good_mask & labels).sum() / max(n_out, 1)
    assert kept_inliers > 0.8, kept_inliers
    assert dropped_outliers > 0.8, dropped_outliers


def test_pcm_improves_solution(noisy_sim):
    data = noisy_sim
    graph_all, init = sim.build_graph_from_sim(data)
    res_all = lm_solve(graph_all, init, max_iterations=50)

    loops = loopset_from_measurements(data.loops)
    pcm = pcm_filter(loops, data.vio, pcm_thres=2.0)
    good_loops = [lp for lp, ok in zip(data.loops, pcm.good_mask) if ok]
    graph_good, _ = sim.build_graph_from_sim(data, loops_override=good_loops)
    res_good = lm_solve(graph_good, init, max_iterations=50)

    err_all = metrics.mean_relative_ate(np.asarray(res_all.poses), data.gt)
    err_good = metrics.mean_relative_ate(np.asarray(res_good.poses), data.gt)
    assert err_good <= err_all, (err_good, err_all)
    assert err_good < 0.1, err_good


def test_pcm_decentralized_partition(noisy_sim):
    data = noisy_sim
    loops = loopset_from_measurements(data.loops)
    # drone 0's view: computes only its own pairs, accepts others
    res0 = pcm_filter(loops, data.vio, pcm_thres=2.0, self_id=0,
                      redundant=False)
    involved = (loops.drone_a == 0) | (loops.drone_b == 0)
    # pairs without drone 0 are accepted wholesale
    assert res0.good_mask[~involved].all()
    # with external inlier sets from a redundant run, results match
    full = pcm_filter(loops, data.vio, pcm_thres=2.0)
    res0x = pcm_filter(loops, data.vio, pcm_thres=2.0, self_id=0,
                       redundant=False, external_inliers=full.pair_inliers)
    np.testing.assert_array_equal(res0x.good_mask[~involved],
                                  full.good_mask[~involved])


def test_pcm_debug_forensics(noisy_sim, tmp_path):
    """debugging_pcm equivalent: records + heatmaps + JSON."""
    from omniswarm_tpu.eval.pcm_debug import write_pcm_debug

    data = noisy_sim
    loops = loopset_from_measurements(data.loops)
    res = pcm_filter(loops, data.vio, pcm_thres=2.0)
    out = write_pcm_debug(str(tmp_path), loops, res, gt=data.gt,
                          pcm_thres=2.0)
    assert out["n_loops"] == len(data.loops)
    assert 0 < out["n_accepted"] <= out["n_loops"]
    # with outliers in the fixture, rejected loops should have larger
    # true errors than accepted ones
    assert out["rejected_pos_err_mean"] > out["accepted_pos_err_mean"]
    assert (tmp_path / "pcm_debug.json").exists()
    import glob
    assert glob.glob(str(tmp_path / "pcm_pair_*.png"))
