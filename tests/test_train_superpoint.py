"""SuperPoint synthetic training: loss decreases, detection quality emerges."""
import numpy as np
import pytest

from omniswarm_tpu.models.train_superpoint import (
    corner_label_map,
    detection_metrics,
    make_batch,
    render_shapes,
    train_detector,
)


def test_render_shapes_and_labels():
    rng = np.random.default_rng(0)
    img, corners = render_shapes(rng, 64, 96)
    assert img.shape == (64, 96) and img.min() >= 0 and img.max() <= 1
    lab = corner_label_map(corners, 64, 96)
    assert lab.shape == (8, 12)
    n_corner_cells = (lab < 64).sum()
    assert 1 <= n_corner_cells <= 20


def test_make_batch_shapes():
    rng = np.random.default_rng(1)
    imgs, labs = make_batch(rng, 4, 64, 96)
    assert imgs.shape == (4, 64, 96, 1)
    assert labs.shape == (4, 8, 12)


@pytest.mark.slow
def test_training_improves_detection():
    params, history = train_detector(steps=300, batch=8, h=64, w=96,
                                     seed=0, log_every=50)
    losses = [l for _, l in history]
    assert losses[-1] < 0.6 * losses[0], losses
    m = detection_metrics(params, n_eval=8)
    # random-weight nets get ~0 recall; trained must find real corners
    assert m["recall"] > 0.25, m
    assert m["precision"] > 0.2, m


def test_bundled_checkpoint_detects_corners():
    from omniswarm_tpu.models.superpoint import pretrained_extractor
    import jax.numpy as jnp

    ex = pretrained_extractor(height=64, width=96, max_keypoints=50,
                              threshold=0.015)
    rng = np.random.default_rng(3)
    img, corners = render_shapes(rng, 64, 96)
    xy, scores, desc, valid = ex(jnp.asarray(img[None, :, :, None]))
    det = np.asarray(xy[0])[np.asarray(valid[0])]
    assert len(det) >= 3, len(det)
    # most detections land near true corners
    hits = 0
    for x, y in det:
        if len(corners) and np.min(
                np.linalg.norm(corners - [x, y], axis=1)) < 4.0:
            hits += 1
    assert hits / len(det) > 0.4, (hits, len(det))


def test_descriptor_matching_under_viewpoint_change():
    """Descriptor-head metric across viewpoint-change severities.

    VERDICT r1 item 7: the bundled checkpoint's matching precision must
    hold up under rotation+zoom viewpoint change, not just mild shifts.
    """
    from omniswarm_tpu.models.superpoint import load_flax_npz
    from omniswarm_tpu.models.train_superpoint import matching_metrics

    import os

    path = os.path.join(os.path.dirname(__file__), "..", "omniswarm_tpu",
                        "models", "weights", "superpoint_synthetic.npz")
    params = load_flax_npz(path)
    easy = matching_metrics(params, n_eval=6)
    hard = matching_metrics(params, n_eval=6, max_rot=0.5,
                            scale=(0.8, 1.25))
    assert easy["matches"] >= 30, easy
    assert easy["match_precision"] >= 0.8, easy
    assert hard["matches"] >= 25, hard
    assert hard["match_precision"] >= 0.6, hard
