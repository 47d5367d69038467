import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rnnpose_tpu.train import checkpoint as ckpt_lib
from rnnpose_tpu.train import optim as optim_lib
from rnnpose_tpu.train.losses import (
    CircleLossConfig,
    circle_loss,
    match_recall,
    point_alignment_loss,
    sequence_flow_loss,
)


# ------------------------------------------------------------- schedules
def test_one_cycle_shape():
    cfg = optim_lib.OptimizerConfig(lr_max=1e-4, total_steps=1000, pct_start=0.1)
    s = optim_lib.one_cycle_schedule(cfg)
    lr0 = float(s(0))
    lr_peak = float(s(100))
    lr_end = float(s(1000))
    np.testing.assert_allclose(lr0, 1e-5, rtol=1e-4)       # lr_max / div
    np.testing.assert_allclose(lr_peak, 1e-4, rtol=1e-4)   # peak at pct_start
    assert lr_end < 1e-8                                   # low/1e4 at end
    # monotone up then down
    ups = [float(s(i)) for i in range(0, 101, 10)]
    assert all(b >= a - 1e-12 for a, b in zip(ups, ups[1:]))


def test_one_cycle_momentum_counter_anneal():
    cfg = optim_lib.OptimizerConfig(total_steps=1000, pct_start=0.1, moms=(0.95, 0.85))
    m = optim_lib.one_cycle_momentum_schedule(cfg)
    np.testing.assert_allclose(float(m(0)), 0.95, atol=1e-6)
    np.testing.assert_allclose(float(m(100)), 0.85, atol=1e-4)
    np.testing.assert_allclose(float(m(1000)), 0.95, atol=1e-4)


def test_exponential_decay():
    s = optim_lib.exponential_decay_schedule(1e-3, 100, 0.1, 0.5)
    np.testing.assert_allclose(float(s(0)), 1e-3)
    np.testing.assert_allclose(float(s(10)), 5e-4)
    np.testing.assert_allclose(float(s(25)), 2.5e-4)


def test_manual_stepping():
    s = optim_lib.manual_stepping_schedule([0.5], [1e-3, 1e-4], 100)
    np.testing.assert_allclose(float(s(10)), 1e-3)
    np.testing.assert_allclose(float(s(60)), 1e-4)


def test_build_optimizer_steps(rng):
    cfg = optim_lib.OptimizerConfig(total_steps=100)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx = optim_lib.build_optimizer(cfg, params)
    state = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    upd, state = tx.update(g, state, params)
    p2 = optax.apply_updates(params, upd)
    assert float(jnp.abs(p2["w"] - params["w"]).max()) > 0


def test_freeze_mask():
    params = {"enc": {"w": jnp.ones(3)}, "head": {"w": jnp.ones(3)}}
    mask = optim_lib.freeze_mask(params, ("enc",))
    assert mask["enc"]["w"] is False or mask["enc"]["w"] == False  # noqa: E712
    assert mask["head"]["w"] == True  # noqa: E712


def test_frozen_params_do_not_move():
    cfg = optim_lib.OptimizerConfig(total_steps=100, freeze_patterns=("enc",))
    params = {"enc": {"w": jnp.ones(3)}, "head": {"w": jnp.ones(3)}}
    tx = optim_lib.build_optimizer(cfg, params)
    state = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    upd, _ = tx.update(g, state, params)
    p2 = optax.apply_updates(params, upd)
    np.testing.assert_allclose(p2["enc"]["w"], params["enc"]["w"])
    assert float(jnp.abs(p2["head"]["w"] - params["head"]["w"]).max()) > 0


# ------------------------------------------------------------- checkpoint
def test_checkpoint_roundtrip(tmp_path, rng):
    state = {
        "params": {"w": jnp.asarray(rng.randn(3, 3).astype(np.float32))},
        "opt": {"mu": jnp.zeros((3, 3))},
    }
    d = str(tmp_path)
    ckpt_lib.save_checkpoint(d, state, step=10)
    ckpt_lib.save_checkpoint(d, state, step=20)
    path = ckpt_lib.latest_checkpoint(d)
    assert path.endswith("rnnpose-20")
    restored = ckpt_lib.restore_checkpoint(path)
    np.testing.assert_allclose(restored["params"]["w"], state["params"]["w"])
    assert restored["step"] == 20


def test_checkpoint_pruning(tmp_path):
    state = {"params": {"w": jnp.ones(2)}}
    for s in range(5):
        ckpt_lib.save_checkpoint(str(tmp_path), state, step=s, max_to_keep=2)
    names = [p for p in os.listdir(tmp_path) if p.startswith("rnnpose-")]
    assert sorted(names) == ["rnnpose-3", "rnnpose-4"]


def test_try_restore_empty(tmp_path):
    assert ckpt_lib.try_restore_latest(str(tmp_path)) is None


# ------------------------------------------------------------- losses
def test_circle_loss_separates(rng):
    """Matching features -> lower loss than anti-matching features."""
    P, C = 32, 8
    pts = rng.randn(P, 3).astype(np.float32) * 0.1
    feats = rng.randn(P, C).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    valid = jnp.ones(P)
    cfg = CircleLossConfig(pos_radius=1e-3, safe_radius=1e-2)
    good = circle_loss(
        jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(feats),
        jnp.asarray(feats), valid, cfg,
    )
    perm = rng.permutation(P)
    bad = circle_loss(
        jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(feats),
        jnp.asarray(feats[perm]), valid, cfg,
    )
    assert float(good) < float(bad)


def test_circle_loss_padding_invariant(rng):
    P, C = 16, 4
    pts = rng.randn(P, 3).astype(np.float32) * 0.1
    feats = rng.randn(P, C).astype(np.float32)
    cfg = CircleLossConfig(pos_radius=1e-3, safe_radius=1e-2)
    v1 = jnp.ones(P)
    l1 = circle_loss(jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(feats), v1, cfg)
    pts2 = np.concatenate([pts, rng.randn(8, 3).astype(np.float32)])
    feats2 = np.concatenate([feats, rng.randn(8, C).astype(np.float32)])
    v2 = jnp.concatenate([jnp.ones(P), jnp.zeros(8)])
    l2 = circle_loss(jnp.asarray(pts2), jnp.asarray(pts2), jnp.asarray(feats2), jnp.asarray(feats2), v2, cfg)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)


def test_match_recall_perfect(rng):
    P, C = 16, 8
    pts = rng.randn(P, 3).astype(np.float32)
    feats = np.eye(P, C * 2)[:, :C].astype(np.float32) if C * 2 >= P else None
    feats = rng.randn(P, C).astype(np.float32) * 10  # distinct features
    r = match_recall(
        jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(feats),
        jnp.asarray(feats), jnp.ones(P), CircleLossConfig(pos_radius=1e-3),
    )
    np.testing.assert_allclose(float(r), 1.0, atol=1e-6)


def test_point_alignment_loss_zero_when_equal(rng):
    R = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
    t = jnp.zeros((2, 3))
    pts = jnp.asarray(rng.randn(2, 20, 3).astype(np.float32))
    l = point_alignment_loss(R, t, R, t, pts)
    np.testing.assert_allclose(float(l), 0.0, atol=1e-6)


def test_sequence_flow_loss_gamma_weighting(rng):
    flow_gt = jnp.zeros((1, 4, 4, 2))
    valid = jnp.ones((1, 4, 4))
    pred = jnp.ones((2, 1, 4, 4, 2))
    l = sequence_flow_loss(pred, flow_gt, valid, gamma=0.5)
    # weights [0.5, 1.0], per-step mean L1 = 1 -> total 1.5
    np.testing.assert_allclose(float(l), 1.5, atol=1e-5)


def test_sequence_flow_loss_length1_is_gamma_free(rng):
    """Reference parity: `cf_net` is only ever called with iters=1
    (`PoseRefiner.py:329`, `CFNet.py:109`), so each history entry is a
    length-1 sequence and the gamma term must degenerate to exactly 1.0."""
    flow_gt = jnp.asarray(rng.randn(1, 4, 4, 2).astype(np.float32))
    valid = jnp.ones((1, 4, 4))
    pred = jnp.asarray(rng.randn(1, 1, 4, 4, 2).astype(np.float32))
    l_a = sequence_flow_loss(pred, flow_gt, valid, gamma=0.8)
    l_b = sequence_flow_loss(pred, flow_gt, valid, gamma=0.1)
    np.testing.assert_allclose(float(l_a), float(l_b), rtol=1e-7)
    np.testing.assert_allclose(
        float(l_a), float(jnp.mean(jnp.abs(pred[0] - flow_gt))), rtol=1e-6
    )


def test_safe_global_norm_overflow_and_parity():
    """`safe_global_norm` == optax.global_norm for normal magnitudes
    (bit-identical: the prescale is exactly 1.0) and stays FINITE where the
    f32 sum-of-squares overflows (|g|~1e17 gradients were being classified
    non-finite and every such step silently skipped —
    tests/test_resume_equivalence.py found it)."""
    tree = {"a": jnp.asarray([3.0, 4.0]), "b": jnp.ones((2, 2))}
    np.testing.assert_array_equal(
        np.asarray(optim_lib.safe_global_norm(tree)),
        np.asarray(optax.global_norm(tree)),
    )

    huge = {"a": jnp.asarray([3e19, 4e19]), "b": jnp.zeros((2,))}
    assert not np.isfinite(float(optax.global_norm(huge)))  # the failure
    np.testing.assert_allclose(
        float(optim_lib.safe_global_norm(huge)), 5e19, rtol=1e-6
    )

    # clip: identity below the threshold, exact rescale above it — including
    # the overflow regime, where optax's clip would emit NaNs.
    clip = optim_lib.safe_clip_by_global_norm(10.0)
    small = {"a": jnp.asarray([3.0, 4.0])}
    out, _ = clip.update(small, clip.init(small))
    np.testing.assert_array_equal(np.asarray(out["a"]), np.asarray(small["a"]))
    out, _ = clip.update(huge, clip.init(huge))
    np.testing.assert_allclose(
        float(optim_lib.safe_global_norm(out)), 10.0, rtol=1e-5
    )
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(out))

    # truly non-finite gradients still yield a non-finite norm (the train
    # loop's skip guard keys off this).
    bad = {"a": jnp.asarray([jnp.inf, 1.0])}
    assert not np.isfinite(float(optim_lib.safe_global_norm(bad)))


def test_train_step_skips_nonfinite_update():
    """A step whose gradients are non-finite must leave params and opt_state
    untouched and flag skipped_nonfinite=1 (regression: one degenerate batch
    turned every parameter NaN through clip_by_global_norm)."""
    import flax.linen as nn
    from rnnpose_tpu.train.loop import make_train_step
    from rnnpose_tpu.train.optim import OptimizerConfig, build_optimizer

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, batch, train=True):
            w = self.param("w", nn.initializers.ones, (3,))
            loss = jnp.sum(w) * batch["scale"]
            z = loss * 0.0
            return {"loss": loss, "circle_loss": z, "recall": z,
                    "flow_loss": z, "loss_3d_proj": z}

    model = Toy()
    params = model.init(jax.random.PRNGKey(0), {"scale": jnp.float32(1.0)})
    tx = build_optimizer(OptimizerConfig(total_steps=10), params)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, donate=False)

    p1, o1, m1 = step(params, opt_state, {"scale": jnp.float32(jnp.inf)})
    assert float(m1["skipped_nonfinite"]) == 1.0
    np.testing.assert_allclose(p1["params"]["w"], params["params"]["w"])
    for a, b in zip(jax.tree_util.tree_leaves(o1),
                    jax.tree_util.tree_leaves(opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    p2, _, m2 = step(params, opt_state, {"scale": jnp.float32(1.0)})
    assert float(m2["skipped_nonfinite"]) == 0.0
    assert not np.allclose(p2["params"]["w"], params["params"]["w"])
