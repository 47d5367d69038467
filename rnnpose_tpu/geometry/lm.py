"""Differentiable Levenberg–Marquardt pose optimization on reprojection residuals.

TPU-native re-design of the reference's
`geometry/transformation.py:265-316` (`reprojction_optim`) and
`geometry/cholesky.py` (float64 Cholesky with custom VJP, NaN-zeroing and
update clamping).

Key departures from the reference, by design:
  * **fp32 instead of fp64.** TPUs have no fast f64. The 6x6 normal-equation
    system is made fp32-safe by (a) accumulating H and b in f32 with
    variance-preserving 'sum of weighted outer products' einsums that XLA
    maps onto the MXU, and (b) **Jacobi (diagonal) preconditioning** of the
    damped system before the Cholesky solve, which bounds the condition
    number regardless of the pixel/metric unit mismatch between the
    translation and rotation blocks. Parity tests (`tests/test_lm.py`)
    verify convergence matches a float64 NumPy reference to <1e-3.
  * The custom VJP of the reference's cholesky solve
    (`geometry/cholesky.py:18-28`, the OptNet rule) is exactly what JAX's
    native autodiff of `cholesky`+`triangular_solve` computes — no custom
    rule needed.
  * The whole LM iteration is jit-compatible: fixed iteration counts,
    no data-dependent control flow, NaN protection via `jnp.where`.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import se3 as se3_ops
from . import projective as proj
from .precise import peinsum

__all__ = [
    "LMConfig",
    "solve_spd",
    "pose_transform_coords",
    "induced_flow",
    "reprojection_optim",
    "solve_pose_from_flow",
]


class LMConfig(NamedTuple):
    """Damping / safety constants (reference `config/default.py:53-55`,
    `geometry/cholesky.py:45`)."""

    lm_lambda: float = 1e-4   # multiplicative damping: H += lm_lambda * diag(H)
    ep_lambda: float = 100.0  # additive damping:       H += ep_lambda * I
    delta_clamp: float = 1.0  # clamp on the twist update
    min_depth: float = 0.1    # validity threshold on source depth
    expm_approx_grad: bool = True  # back the pose increment's expm with the
                                   # reference's small-angle VJP
                                   # (`se3.py:212-222`) — gradient-parity
                                   # verified in tests/test_torch_parity.py
                                   # (test_lm_gradient_parity). False = exact
                                   # expm differentials (se3.se3_expm).


def solve_spd(H: jnp.ndarray, b: jnp.ndarray, delta_clamp: float = 1.0) -> jnp.ndarray:
    """Solve H x = b for SPD H with Jacobi preconditioning, NaN-zeroing, clamp.

    Args:
      H: (..., 6, 6) damped normal matrix.
      b: (..., 6) right-hand side.
    Returns:
      x: (..., 6), zeroed where non-finite, clamped to +-delta_clamp
      (reference `geometry/cholesky.py:32-50`).
    """
    # Jacobi preconditioner: D = diag(H)^(-1/2); solve (D H D) y = D b, x = D y.
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(H, axis1=-2, axis2=-1), 1e-12))
    d_inv = 1.0 / d
    Hs = H * d_inv[..., :, None] * d_inv[..., None, :]
    bs = b * d_inv
    n = H.shape[-1]
    if n <= 8:
        # Unrolled Cholesky-Crout + substitution: ~n^2 fused elementwise ops,
        # batched over leading dims. Beats the generic path twice over: XLA's
        # blocked cholesky/triangular-solve are while-loop machinery that a
        # 6x6 LM system never amortizes (TPU), and on CPU they lower to
        # LAPACK FFI custom calls that a deserialize-only `jax.export`
        # consumer process has no registration for (the repo-free serving
        # contract, tests/test_export.py::test_export_standalone_consumer).
        L = [[None] * n for _ in range(n)]
        for j in range(n):
            s = Hs[..., j, j] - sum(L[j][k] ** 2 for k in range(j))
            # No clamp: non-SPD input must yield NaN (like LAPACK potrf's
            # failure) so the isfinite zeroing below catches it.
            L[j][j] = jnp.sqrt(s)
            for i in range(j + 1, n):
                s = Hs[..., i, j] - sum(L[i][k] * L[j][k] for k in range(j))
                L[i][j] = s / L[j][j]
        yv = []
        for i in range(n):
            yv.append(
                (bs[..., i] - sum(L[i][k] * yv[k] for k in range(i))) / L[i][i]
            )
        xv = [None] * n
        for i in reversed(range(n)):
            xv[i] = (
                yv[i] - sum(L[k][i] * xv[k] for k in range(i + 1, n))
            ) / L[i][i]
        y = jnp.stack(xv, axis=-1)
    else:
        L = jnp.linalg.cholesky(Hs)
        y = jax.scipy.linalg.solve_triangular(L, bs[..., None], lower=True)
        y = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2), y, lower=False
        )[..., 0]
    x = y * d_inv
    x = jnp.where(jnp.isfinite(x), x, jnp.zeros_like(x))
    return jnp.clip(x, -delta_clamp, delta_clamp)


def pose_transform_coords(
    T: jnp.ndarray,
    depth: jnp.ndarray,
    intrinsics: jnp.ndarray,
    min_depth: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backproject -> rigid transform -> project: the pose-induced coords.

    Reference `SE3.transform` (`geometry/transformation.py:184-198`).

    Args:
      T: (B, 4, 4) relative pose.
      depth: (B, H, W) source-view depth.
      intrinsics: (B, 4).
    Returns:
      coords1: (B, H, W, 2) pixel coords in the target view.
      valid: (B, H, W) float mask (source depth > min_depth).
    """
    X0 = proj.backproject(depth, intrinsics)           # (B, H, W, 3)
    X1 = proj.transform_points(T, X0.reshape(X0.shape[0], -1, 3)).reshape(X0.shape)
    coords1, _ = proj.project(X1, intrinsics[:, None, None, :])
    valid = (depth > min_depth).astype(depth.dtype)
    return coords1, valid


def induced_flow(
    T: jnp.ndarray, depth: jnp.ndarray, intrinsics: jnp.ndarray,
    min_depth: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pose-induced optical flow (reference `transformation.py:200-208`)."""
    coords1, valid = pose_transform_coords(T, depth, intrinsics, min_depth)
    h, w = depth.shape[-2], depth.shape[-1]
    grid = proj.coords_grid(h, w, dtype=depth.dtype)
    return coords1 - grid, valid


def _lm_step(
    T: jnp.ndarray,
    target: jnp.ndarray,
    weight: jnp.ndarray,
    X0: jnp.ndarray,
    valid: jnp.ndarray,
    intrinsics: jnp.ndarray,
    cfg: LMConfig,
) -> jnp.ndarray:
    """One damped Gauss-Newton step. Shapes: T (B,4,4), target/weight (B,H,W,2),
    X0 (B,H,W,3), valid (B,H,W), intrinsics (B,4)."""
    B = T.shape[0]
    X1 = proj.transform_points(T, X0.reshape(B, -1, 3)).reshape(X0.shape)
    uv, j_proj = proj.project(X1, intrinsics[:, None, None, :], jacobian=True)
    j_tf = proj.local_perturb_jacobian(X1)             # (B, H, W, 3, 6)
    J = peinsum("...ij,...jk->...ik", j_proj, j_tf)  # (B, H, W, 2, 6)

    r = target - uv                                     # (B, H, W, 2)
    # Reference v-mask requires BOTH source and transformed depth in front
    # (`transformation.py:289-291`: (X0z > MIN_DEPTH) & (X1z > MIN_DEPTH)).
    v = valid * (X1[..., 2] > cfg.min_depth).astype(valid.dtype)
    w_all = weight * v[..., None]                       # (B, H, W, 2)

    # Normal equations. Flatten pixels*2 into one contraction axis so XLA can
    # lower these to batched MXU matmuls:  H = Jw^T J,  b = Jw^T r.
    Jf = J.reshape(B, -1, 6)                            # (B, P*2, 6)
    wf = w_all.reshape(B, -1)                           # (B, P*2)
    rf = r.reshape(B, -1)                               # (B, P*2)
    Jw = Jf * wf[..., None]
    H = peinsum("bpi,bpj->bij", Jw, Jf)                 # (B, 6, 6)
    b = peinsum("bpi,bp->bi", Jw, rf)                   # (B, 6)

    eye = jnp.eye(6, dtype=H.dtype)
    diag = jnp.diagonal(H, axis1=-2, axis2=-1)
    H = H + cfg.ep_lambda * eye + cfg.lm_lambda * diag[..., None] * eye

    delta = solve_spd(H, b, cfg.delta_clamp)
    return se3_ops.se3_increment(T, delta, approx_grad=cfg.expm_approx_grad)


def reprojection_optim(
    T: jnp.ndarray,
    target: jnp.ndarray,
    weight: jnp.ndarray,
    depth: jnp.ndarray,
    intrinsics: jnp.ndarray,
    num_iters: int = 1,
    cfg: LMConfig = LMConfig(),
) -> jnp.ndarray:
    """Differentiable LM refinement of T against a target correspondence field.

    Minimizes sum over valid pixels of
      || w * (target - proj(T * backproj(depth)))||^2
    by `num_iters` damped Gauss-Newton steps with left-multiplicative se(3)
    updates (reference `reprojction_optim`, `transformation.py:265-316`).

    Args:
      T: (B, 4, 4) initial relative pose.
      target: (B, H, W, 2) target pixel coords (from the flow network).
      weight: (B, H, W, 2) per-pixel confidence (similarity weights).
      depth: (B, H, W) rendered source depth (defines the 3D points; detached
        in the reference — callers should `lax.stop_gradient` it to match).
      intrinsics: (B, 4).
      num_iters: static LM iteration count (reference OPTIM_ITER_COUNT=1).
    Returns:
      Refined T: (B, 4, 4).
    """
    X0 = proj.backproject(depth, intrinsics)
    valid = (depth > cfg.min_depth).astype(depth.dtype)
    for _ in range(num_iters):  # static count: unrolled under jit
        T = _lm_step(T, target, weight, X0, valid, intrinsics, cfg)
    return T


def solve_pose_from_flow(
    T_init: jnp.ndarray,
    flow: jnp.ndarray,
    weight: jnp.ndarray,
    depth: jnp.ndarray,
    intrinsics: jnp.ndarray,
    num_iters: int = 1,
    cfg: LMConfig = LMConfig(),
) -> jnp.ndarray:
    """Convenience wrapper: target = grid + flow."""
    h, w = depth.shape[-2], depth.shape[-1]
    grid = proj.coords_grid(h, w, dtype=depth.dtype)
    return reprojection_optim(
        T_init, grid + flow, weight, depth, intrinsics, num_iters, cfg
    )
