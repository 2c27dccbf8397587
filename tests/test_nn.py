"""Device brute-force NN vs scipy cKDTree parity (evaluation/nn.py).

The device path (expansion matmul + approx_max_k candidates + exact
refine) must reproduce scipy's nearest-neighbor distances and indices;
eval_pointcloud must produce the same metrics through either backend.
"""

import numpy as np
import pytest

from nphm_tpu.evaluation.metrics import eval_pointcloud
from nphm_tpu.evaluation.nn import nearest_neighbors


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.default_rng(7)
    q = (rng.normal(size=(5000, 3)) * 120).astype(np.float32)  # mm scale
    r = (rng.normal(size=(7000, 3)) * 120).astype(np.float32)
    return q, r


def test_device_matches_scipy(clouds):
    q, r = clouds
    d_dev, i_dev = nearest_neighbors(q, r, backend="device")
    d_sp, i_sp = nearest_neighbors(q, r, backend="scipy")
    np.testing.assert_allclose(d_dev, d_sp, atol=1e-4)
    assert (i_dev == i_sp).all()


def test_device_matches_scipy_tiny_distances(clouds):
    """Near-duplicate points: the regime where the f32 expansion form is
    ill-conditioned and the exact candidate refine must save it."""
    q, r = clouds
    rng = np.random.default_rng(8)
    r2 = np.concatenate(
        [q + rng.normal(size=q.shape).astype(np.float32) * 1e-3, r]
    )
    d_dev, i_dev = nearest_neighbors(q, r2, backend="device")
    d_sp, i_sp = nearest_neighbors(q, r2, backend="scipy")
    np.testing.assert_allclose(d_dev, d_sp, atol=1e-4)
    assert (i_dev == i_sp).all()


def test_eval_pointcloud_backend_parity(clouds):
    q, r = clouds
    m_dev = eval_pointcloud(q, r, metric_space=False, nn_backend="device")
    m_sp = eval_pointcloud(q, r, metric_space=False, nn_backend="scipy")
    for key in m_sp:
        if np.isnan(m_sp[key]):
            assert np.isnan(m_dev[key])
        else:
            np.testing.assert_allclose(m_dev[key], m_sp[key], rtol=1e-6)


def test_odd_sizes_pad_correctly():
    """Non-multiple-of-chunk query counts and non-multiple-of-256 ref
    counts exercise both padding paths."""
    rng = np.random.default_rng(9)
    q = rng.normal(size=(2049, 3)).astype(np.float32)
    r = rng.normal(size=(333, 3)).astype(np.float32)
    d_dev, i_dev = nearest_neighbors(q, r, backend="device")
    d_sp, i_sp = nearest_neighbors(q, r, backend="scipy")
    np.testing.assert_allclose(d_dev, d_sp, atol=1e-5)
    assert (i_dev == i_sp).all()
