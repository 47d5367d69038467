"""Tests for aux modules: metrics, fragments, visualize, loader, profiling."""
import numpy as np
import pytest

from rnnpose_tpu.train.metrics import (
    MetricDict,
    PrecisionRecall,
    RunningAccuracy,
    RunningScalar,
)
from rnnpose_tpu.render.fragments import fragment_vertices
from rnnpose_tpu.utils.visualize import (
    depth_to_color,
    flow_to_color,
    project_pose_overlay,
)
from rnnpose_tpu.utils.profiling import Timer, timed, timings


def test_running_scalar():
    s = RunningScalar()
    s.update(1.0)
    s.update(3.0)
    assert s.value == 2.0
    s.reset()
    assert s.count == 0


def test_running_accuracy():
    a = RunningAccuracy()
    a.update([1, 0, 1], [1, 1, 1])
    assert abs(a.value - 2 / 3) < 1e-9


def test_precision_recall():
    pr = PrecisionRecall()
    pr.update([0.9, 0.8, 0.1], [1, 0, 1])
    assert pr.precision == 0.5
    assert pr.recall == 0.5


def test_metric_dict():
    m = MetricDict()
    m.update({"loss": 2.0})
    m.update({"loss": 4.0, "acc": 1.0})
    s = m.summary()
    assert s["loss"] == 3.0 and s["acc"] == 1.0


def test_fragment_vertices(rng):
    verts = rng.randn(200, 3).astype(np.float32)
    centers, idx, frag = fragment_vertices(verts, 16)
    assert centers.shape == (16, 3) and idx.shape == (16,)
    assert frag.shape == (200,)
    assert set(np.unique(frag)).issubset(set(range(16)))
    # centers are actual vertices
    np.testing.assert_allclose(centers, verts[idx])


def test_flow_to_color(rng):
    f = flow_to_color(rng.randn(8, 8, 2).astype(np.float32))
    assert f.shape == (8, 8, 3)
    assert f.min() >= 0 and f.max() <= 1.0 + 1e-6
    # zero flow -> white
    z = flow_to_color(np.zeros((4, 4, 2), np.float32))
    np.testing.assert_allclose(z, 1.0, atol=1e-5)


def test_depth_to_color():
    d = np.zeros((4, 4), np.float32)
    d[1, 1] = 1.0
    c = depth_to_color(d)
    assert c.shape == (4, 4, 3)
    np.testing.assert_allclose(c[0, 0], 0.0)


def test_pose_overlay(rng):
    img = np.zeros((32, 32, 3), np.float32)
    pts = rng.randn(50, 3).astype(np.float32) * 0.01
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 0.5
    K = np.asarray([100.0, 100.0, 16.0, 16.0], np.float32)
    out = project_pose_overlay(img, pts, T, K)
    assert out.sum() > 0


def test_timers():
    import time

    with timed("unit_test_block"):
        time.sleep(0.01)
    assert timings["unit_test_block"].total >= 0.01
    t = Timer()
    with t:
        pass
    assert t.count == 1
