"""C++ native ops vs numpy reference parity."""
import numpy as np
import pytest

from rnnpose_tpu.cpp import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="C++ native ops not built"
)


def test_grid_subsample_matches_numpy(rng):
    from rnnpose_tpu.data import pyramid as pyr

    pts = rng.rand(5000, 3).astype(np.float32)
    a = native.grid_subsample(pts, 0.1)
    # force the numpy path by monkeypatching availability
    import rnnpose_tpu.data.pyramid as p

    orig = p._cpp
    p._cpp = lambda: None
    try:
        b = pyr.grid_subsample(pts, 0.1)
    finally:
        p._cpp = orig
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_radius_neighbors_matches_numpy(rng):
    from rnnpose_tpu.data import pyramid as pyr

    q = rng.rand(200, 3).astype(np.float32)
    s = rng.rand(500, 3).astype(np.float32)
    a = native.radius_neighbors(q, s, 0.15, 20)
    import rnnpose_tpu.data.pyramid as p

    orig = p._cpp
    p._cpp = lambda: None
    try:
        b = pyr.radius_neighbors(q, s, 0.15, 20)
    finally:
        p._cpp = orig
    # Same sets of neighbors; ties in distance may order differently, so
    # compare sorted index sets per row plus ordering by distance.
    assert a.shape == b.shape
    for i in range(len(q)):
        assert set(a[i].tolist()) == set(b[i].tolist()), i
        da = np.linalg.norm(s[a[i][a[i] < 500]] - q[i], axis=-1)
        assert (np.diff(da) >= -1e-6).all()


def test_radius_neighbors_shadow(rng):
    q = np.zeros((1, 3), np.float32)
    s = np.asarray([[10.0, 0, 0]], np.float32)
    out = native.radius_neighbors(q, s, 0.5, 4)
    assert (out == 1).all()  # all shadow


def test_empty_support():
    q = np.zeros((2, 3), np.float32)
    s = np.zeros((0, 3), np.float32)
    out = native.radius_neighbors(q, s, 0.5, 4)
    assert (out == 0).all()
