"""Optimizer + LR schedules (optax).

Re-design of the reference's fastai-style training stack:
  * `OneCycle` (`torchplus/train/learning_schedules_fastai.py:68-94`):
    cosine anneal lr_max/div -> lr_max over pct_start, then lr_max ->
    lr_max/div/1e4; momentum counter-annealed moms[0]->moms[1]->moms[0].
  * `ExponentialDecay(Warmup)` / `ManualStepping`
    (`learning_schedules_fastai.py:96-176`).
  * Adam with decoupled ('true'/fixed) weight decay, betas (0.9, 0.99),
    grad-clip 10 (`builder/optimizer_builder.py:64-115`,
    `tools/train.py:574`).
  * Parameter freezing by regex (`tools/train.py:97-131`
    `freeze_params_v2`) as an optax mask.

The reference's `OptimWrapper` exists to mutate hyperparameters in place;
optax schedules + `inject_hyperparams` make that machinery unnecessary.
"""
from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "OptimizerConfig",
    "one_cycle_schedule",
    "one_cycle_momentum_schedule",
    "exponential_decay_schedule",
    "manual_stepping_schedule",
    "build_optimizer",
    "freeze_mask",
    "safe_global_norm",
    "safe_clip_by_global_norm",
]


def safe_global_norm(tree) -> jnp.ndarray:
    """Overflow-safe L2 norm of a pytree.

    `optax.global_norm` sums f32 squares, which overflows to inf for
    legitimately-huge-but-finite gradients (|g| ≳ 1e19; seen at ~1e17 on
    degenerate frames) — and an inf norm turns clip-by-global-norm into
    all-NaN updates, or (with the skip guard) silently discards every such
    step. Prescaling by the max|leaf| keeps the squares in range; the
    prescale is exactly 1.0 for healthy magnitudes, so this is bit-identical
    to `optax.global_norm` on normal steps.
    """
    leaves = [l for l in jax.tree.leaves(tree) if l.size]
    if not leaves:
        return jnp.zeros(())
    gmax = jnp.max(
        jnp.stack([jnp.max(jnp.abs(l.astype(jnp.float32))) for l in leaves])
    )
    scale = jnp.where(gmax > 1e4, gmax, 1.0)
    ss = sum(jnp.sum(jnp.square(l.astype(jnp.float32) / scale)) for l in leaves)
    return scale * jnp.sqrt(ss)


def safe_clip_by_global_norm(max_norm: float) -> optax.GradientTransformation:
    """`optax.clip_by_global_norm` on the overflow-safe norm: huge finite
    gradients get rescaled into the trust region instead of becoming NaN.
    Truly non-finite gradients still produce a non-finite norm (the train
    loop's skip guard handles those)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        norm = safe_global_norm(updates)
        factor = jnp.where(norm > max_norm, max_norm / norm, 1.0)
        return jax.tree.map(lambda g: g * factor, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Mirrors `template_fw0.5.yml:112-131`."""

    lr_max: float = 1e-4
    moms: Tuple[float, float] = (0.95, 0.85)
    div_factor: float = 10.0
    pct_start: float = 0.01
    weight_decay: float = 1e-4
    amsgrad: bool = False          # reference default false
    total_steps: int = 200_000
    grad_clip: float = 10.0
    freeze_patterns: Tuple[str, ...] = ()


def _annealing_cos(start, end, pct):
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def one_cycle_schedule(cfg: OptimizerConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """lr(step), matching `OneCycle` phase boundaries exactly."""
    a1 = int(cfg.total_steps * cfg.pct_start)
    low = cfg.lr_max / cfg.div_factor

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        up = _annealing_cos(low, cfg.lr_max, step / jnp.maximum(a1, 1))
        down = _annealing_cos(
            cfg.lr_max, low / 1e4,
            (step - a1) / jnp.maximum(cfg.total_steps - a1, 1),
        )
        return jnp.where(step < a1, up, down)

    return sched


def one_cycle_momentum_schedule(cfg: OptimizerConfig):
    """beta1(step): moms counter-anneal (`learning_schedules_fastai.py:88-91`)."""
    a1 = int(cfg.total_steps * cfg.pct_start)
    m0, m1 = cfg.moms

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        up = _annealing_cos(m0, m1, step / jnp.maximum(a1, 1))
        down = _annealing_cos(
            m1, m0, (step - a1) / jnp.maximum(cfg.total_steps - a1, 1)
        )
        return jnp.where(step < a1, up, down)

    return sched


def exponential_decay_schedule(
    initial_lr: float, total_steps: int, decay_length: float,
    decay_factor: float, staircase: bool = True,
):
    """`ExponentialDecay` (`learning_schedules_fastai.py:96-150`)."""
    steps_per_decay = max(int(decay_length * total_steps), 1)

    def sched(step):
        p = jnp.asarray(step, jnp.float32) / steps_per_decay
        if staircase:
            p = jnp.floor(p)
        return initial_lr * (decay_factor ** p)

    return sched


def manual_stepping_schedule(boundaries: Sequence[float], rates: Sequence[float], total_steps: int):
    """`ManualStepping` (`learning_schedules_fastai.py:152-176`)."""
    bounds = [int(b * total_steps) for b in boundaries]

    def sched(step):
        step = jnp.asarray(step)
        idx = jnp.sum(jnp.asarray([step >= b for b in bounds]), axis=0)
        return jnp.asarray(rates)[idx]

    return sched


def freeze_mask(params, patterns: Sequence[str]):
    """True (=train) where no regex matches the '/'-joined param path."""
    if not patterns:
        return jax.tree.map(lambda _: True, params)
    regexes = [re.compile(p) for p in patterns]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def trainable(path):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        return not any(r.search(name) for r in regexes)

    paths = {jax.tree_util.keystr(p): trainable(p) for p, _ in flat}
    return jax.tree_util.tree_map_with_path(
        lambda p, _: paths[jax.tree_util.keystr(p)], params
    )


def build_optimizer(
    cfg: OptimizerConfig, params: Optional[Any] = None
) -> optax.GradientTransformation:
    """Adam + decoupled weight decay + OneCycle lr/momentum + clip-10.

    Matches `optimizer_builder.build` semantics: betas (0.9, 0.99), decoupled
    wd 1e-4 ('fixed_weight_decay'), grad clip 10 applied before the update
    (`tools/train.py:574-575`).
    """
    lr = one_cycle_schedule(cfg)
    mom = one_cycle_momentum_schedule(cfg)

    def scale_by_adam_scheduled():
        base = optax.inject_hyperparams(optax.scale_by_adam)(b1=mom, b2=0.99)
        return base

    tx = optax.chain(
        safe_clip_by_global_norm(cfg.grad_clip),
        scale_by_adam_scheduled(),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.inject_hyperparams(optax.scale)(
            step_size=lambda step: -lr(step)
        ),
    )
    # Kernel-point dispositions ride the param tree for checkpoint
    # conversion but are never trained (requires_grad=False in the
    # reference, `kpconv_blocks.py:99`).
    patterns = tuple(cfg.freeze_patterns) + (r"kernel_points",)
    if params is not None:
        mask = freeze_mask(params, patterns)
        tx = optax.multi_transform(
            {True: tx, False: optax.set_to_zero()},
            jax.tree.map(lambda m: m, mask),
        )
    return tx
