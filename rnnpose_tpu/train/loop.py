"""Training step + loop.

Re-design of the reference train loop (`tools/train.py:531-653`): the
per-step body (forward, loss, backward, allreduce, clip, optimizer step,
metric reduction) collapses into ONE jitted SPMD function — gradient
all-reduce is inserted by XLA from the shardings (replacing DDP/NCCL,
`tools/train.py:441-453,570-571`), grad-clip 10 lives inside the optax chain
and the LR/momentum schedule is a pure function of the step
(`tools/train.py:545`).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..models.rnnpose import RNNPose, RNNPoseInputs
from ..parallel import mesh as mesh_lib
from . import optim as optim_lib
from .optim import OptimizerConfig, build_optimizer

__all__ = ["TrainState", "make_train_step", "Trainer"]


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def make_train_step(
    model: nn.Module,
    tx: optax.GradientTransformation,
    donate: bool = True,
) -> Callable:
    """Build the jitted train step: (params, opt_state, batch) ->
    (params, opt_state, metrics). Under a Mesh with sharded batch inputs
    this is the full data-parallel step (XLA adds the psum)."""

    def step(params, opt_state, batch: RNNPoseInputs):
        def loss_fn(p):
            out = model.apply(p, batch, train=True)
            return out["loss"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grad_norm = optim_lib.safe_global_norm(grads)
        # Skip the update entirely when the step produced non-finite
        # gradients (degenerate sample, overflow in a long norm chain):
        # clip_by_global_norm would otherwise turn every parameter NaN in
        # one step. The reference has no such guard — torch propagates the
        # NaN — but "skip and report" is the TPU-native failure-detection
        # analog of its skip-degenerate-sample data path (SURVEY §5.3).
        # The norm is the overflow-safe one: huge-but-FINITE gradients are
        # the clip's job (rescale into the trust region), not the guard's —
        # plain optax.global_norm overflows f32 at |g|~1e19 and would
        # classify those steps as non-finite, silently freezing training on
        # hard batches (found by tests/test_resume_equivalence.py).
        finite = jnp.isfinite(grad_norm)
        safe_grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt_state = tx.update(safe_grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        params = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_params, params
        )
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_opt_state, opt_state
        )
        metrics = {
            "loss": loss,
            "circle_loss": out["circle_loss"],
            "recall": out["recall"],
            "flow_loss": out["flow_loss"],
            "loss_3d_proj": out["loss_3d_proj"],
            "grad_norm": grad_norm,
            "skipped_nonfinite": (~finite).astype(jnp.float32),
        }
        return params, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


class Trainer:
    """Minimal orchestration: state, stepping, periodic logging/checkpointing.

    The heavy lifting (data loading, eval) is composed by the CLI
    (`tools/train.py`); this class owns only the device-side loop state.
    """

    def __init__(
        self,
        model: nn.Module,
        opt_cfg: OptimizerConfig,
        init_batch: RNNPoseInputs,
        rng: Optional[jax.Array] = None,
        mesh=None,
    ):
        self.model = model
        self.mesh = mesh
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        params = model.init(rng, init_batch, train=False)
        self.tx = build_optimizer(opt_cfg, params)
        opt_state = self.tx.init(params)
        if mesh is not None:
            params = mesh_lib.replicate_params(params, mesh)
            opt_state = mesh_lib.replicate_params(opt_state, mesh)
        self.state = TrainState(params=params, opt_state=opt_state, step=0)
        self._step_fn = make_train_step(model, self.tx)

    def run_step(self, batch: RNNPoseInputs) -> Dict[str, float]:
        p, o, metrics = self._step_fn(self.state.params, self.state.opt_state, batch)
        self.state = TrainState(params=p, opt_state=o, step=self.state.step + 1)
        return metrics
