"""PoseRefiner: the recurrent render-flow-optimize engine, TPU-native.

Re-design of the reference `model/PoseRefiner.py:60-436`. The reference's
structure (outer render loop x RENDER_ITER_COUNT=3, inner GRU+LM loop x
ITER_COUNT=4, `PoseRefiner.py:239,315`) is preserved, but the execution model
is rebuilt for XLA:

  * The inner loop is a `flax.linen.scan` with an explicit carry
    (Tij, GRU hidden, coords) — replacing the reference's mutable module
    state (`self.net/self.corr_fn`, `CFNet.py:115-133`) and Python history
    lists (`PoseRefiner.py:88-114`); histories come out as stacked scan
    outputs for the loss.
  * The zoom-crop affine is computed **in-graph** from the splatted
    foreground mask (`geometry/crop.py`), replacing the host cv2 round-trip
    (`PoseRefiner.py:145-218`) — the whole 3x4 recurrence jits as one XLA
    program with zero host syncs.
  * Rendering is the pure-JAX rasterizer (`render/raster.py`); RGB, context
    features and 3D descriptors are interpolated as vertex attributes in ONE
    rasterization whose z-buffer is also the depth map — the reference's
    legacy second depth render (`PoseRefiner.py:296-304`) is merged away.
  * The LM step is fp32 with Jacobi preconditioning (`geometry/lm.py`),
    replacing the fp64 path.

Gradient semantics match the reference: rasterization, poses into the
renderer, crop intrinsics and Tij across iterations are stop-gradiented
(`PoseRefiner.py:141,248-251,319-321`); gradients flow through rendered
feature *values*, the flow network, the similarity weights and each LM step.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geometry import crop as crop_lib
from ..geometry import lm as lm_lib
from ..geometry import projective as proj
from ..geometry import se3 as se3_lib
from ..ops import corr as corr_ops
from ..ops.sampler import bilinear_sample, separable_crop_sample
from ..render.raster import (
    Fragments,
    compute_bary,
    interpolate_attributes,
    interpolate_attributes_onehot,
    rasterize,
    rasterize_with_vis_attrs,
)
from ..render.shading import headlight_shade
from .cfnet import GRUFlowStep, ImageFeaEncoder, downsample_flow, split_context
from ..geometry.precise import peinsum, pmatmul

__all__ = ["RefinerConfig", "MeshAssets", "RefinerOutputs", "PoseRefiner"]

EPS = 1e-5  # depth epsilon (reference `PoseRefiner.py:21`)


@dataclasses.dataclass(frozen=True)
class RefinerConfig:
    """Mirrors `config/linemod/template_fw0.5.yml:74-84` + BASIC sizes."""

    render_iters: int = 3          # RENDER_ITER_COUNT
    gru_iters: int = 4             # ITER_COUNT
    optim_iters: int = 1           # OPTIM_ITER_COUNT
    zoom_crop_size: int = 240      # BASIC.zoom_crop_size
    margin_ratio: float = 0.4      # crop margin (PoseRefiner.py:145-218)
    corr_radius: int = 4
    corr_levels: int = 4
    hidden_dim: int = 128
    context_dim: int = 128
    feature_scale: float = 0.1     # ctx-feature scale (PoseRefiner.py:283)
    with_corr_weight: bool = True
    lm_lambda: float = 1e-4        # LM.LM_LMBDA (config/default.py:53-55)
    ep_lambda: float = 100.0       # LM.EP_LMBDA
    raster_chunk: int = 128
    remat: bool = False            # rematerialize the inner scan body in the
                                   # backward. Measured on v5e (BENCHLOG r5
                                   # #4): slightly FASTER despite +3% FLOPs
                                   # (49.0 -> 47.0 ms/step B=1, 264.9 -> 256.5
                                   # B=8) and -44% peak training HBM at B=8
                                   # (11.4 -> 6.4 GB; B=16 fits one chip) —
                                   # BUT a controlled same-seed overfit A/B
                                   # showed it DEGRADES learning (held-out ADD
                                   # ratio 0.63 -> 0.91 at 150 steps; the
                                   # replayed backward is not gradient-neutral
                                   # for this recurrence at f32/bf16), so it
                                   # stays OFF by default: an opt-in MEMORY
                                   # knob (model.motion_net.remat) for batch
                                   # scaling, not a free speed win. Eval is
                                   # unaffected (no backward).
    mixed_precision: bool = True   # bf16 encoder + GRU convs — the TPU analog
                                   # of the reference's AMP autocast
                                   # (`CFNet.py:44-46,126,152`, yml:88)
    corr_weight_res: str = "eighth"  # 'eighth' (TPU-first, similarity on the
                                   # 1/8 grid) or 'full' (reference-exact)
    emit_full_flow: bool = True    # convex-upsample the flow to full res each
                                   # iteration (needed by the training loss;
                                   # inference can skip it - see RNNPose)
    backface_cull: bool = False    # cull faces pointing away from the camera
                                   # (normal test with a silhouette margin)
                                   # and compact the sweep to 5/8 of the face
                                   # budget. Winding is guaranteed by
                                   # render/mesh.orient_faces_outward on the
                                   # load paths, but measured SLOWER on v5e
                                   # at 4096 faces (B=1: 64.5 vs 85.9 fps;
                                   # B=8: 79.0 vs 125.3): the per-pose
                                   # compaction sort + losing the fused
                                   # raster+attr kernel outweigh the 3/8
                                   # face saving. Kept selectable for much
                                   # larger face budgets.
    corr_impl: str = "mulreduce"   # corr_lookup contraction lowering
                                   # ('mulreduce' | 'bandmm'); on-chip
                                   # ablation at shipping shapes (B=8):
                                   # 2.67 vs 5.11 ms standalone (BENCHLOG r4)
    scan_unroll: int = 1           # unroll factor for the inner nn.scan.
                                   # MEASURED NO-GO at 4 (BENCHLOG r4 #5):
                                   # B=8 152.0 vs 150.1 fps (noise), B=1
                                   # REGRESSED 100.4 -> 88.0, GFLOP/frame
                                   # +20% (XLA re-materializes across the
                                   # unrolled bodies), TPU compile ~5x
                                   # slower. Kept as a knob for future
                                   # shapes; 1 = true lax.scan.
    lm_res: str = "eighth"         # LM residual grid: 'eighth' (default,
                                   # TPU-first: normal equations accumulated
                                   # on the 1/8 grid the flow actually lives
                                   # on - 64x fewer residuals; measured BOTH
                                   # 1.5x faster AND equal-or-better held-out
                                   # ADD than 'full' in overfit_check) or
                                   # 'full' (reference-exact 240^2 residuals)
    legacy_squash_255: bool = False  # reproduce the reference's encoder
                                   # input quirk: its pipeline feeds [0,1]
                                   # images (`data/preprocess.py:497`) into a
                                   # byte-range normalizer (`CFNet.py:42-43`),
                                   # so the RAFT encoder actually sees
                                   # 2*(x/255)-1 ~= -1 and the FIRST
                                   # InstanceNorm's eps (1e-5, vs a ~2e-6
                                   # activation variance) meaningfully shapes
                                   # the features the released weights were
                                   # trained with. Off (default): proper
                                   # [-1,1] normalization, better conditioned.

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.mixed_precision else None

    @property
    def lm_config(self) -> lm_lib.LMConfig:
        return lm_lib.LMConfig(lm_lambda=self.lm_lambda, ep_lambda=self.ep_lambda)


class MeshAssets(NamedTuple):
    """Static per-class mesh, padded to fixed budgets (`render/mesh.py`)."""

    verts: jnp.ndarray       # (V, 3) object-frame vertices (normalized model)
    faces: jnp.ndarray       # (F, 3) int32
    colors: jnp.ndarray      # (V, 3) in [0, 1]
    vert_valid: jnp.ndarray  # (V,) 1.0 for real vertices
    face_valid: jnp.ndarray  # (F,) bool
    normals: Optional[jnp.ndarray] = None  # (V, 3) object-frame normals


class RefinerOutputs(NamedTuple):
    """Histories stacked as (render_iters * gru_iters, B, ...) where noted."""

    Ti_pred: jnp.ndarray          # (B, 4, 4) final refined pose
    Tij: jnp.ndarray              # (B, 4, 4) last relative correction
    flow_history: jnp.ndarray     # (T, B, S, S, 2)
    Tij_history: jnp.ndarray      # (T, B, 4, 4)
    Ti_history: jnp.ndarray       # (T, B, 4, 4) pose before each iter (stopgrad)
    Tij_gt_history: jnp.ndarray   # (T, B, 4, 4) GT relative pose (stopgrad)
    intrinsics_history: jnp.ndarray  # (T, B, 4) crop intrinsics
    syn_depth_history: jnp.ndarray   # (R, B, S, S) rendered depth per render iter
    weight: jnp.ndarray           # (B, S, S, 1) last similarity weight
    syn_img: jnp.ndarray          # (B, S, S, 3) last rendered reference image
    image_crop: jnp.ndarray       # (B, S, S, 3) last observed crop
    valid_mask: jnp.ndarray       # (B, S, S) fg mask of last render


class _InnerStep(nn.Module):
    """One GRU + similarity-weight + LM iteration (scan body).

    Carry: dict with Tij (B,4,4), h (B,s,s,128), coords_lr (B,s,s,2) plus
    loop-invariant tensors (threaded unchanged through the carry).
    """

    cfg: RefinerConfig

    @nn.compact
    def __call__(self, carry, inv):
        """carry: {Tij, h} (the true loop state). inv: loop-invariant tensors
        (corr pyramid, descriptors, depth, intrinsics) passed via
        `nn.broadcast` so the scan does NOT copy them every iteration —
        carrying them cost ~39 ms/frame of pure DMA in device traces."""
        cfg = self.cfg
        c = inv
        S = cfg.zoom_crop_size
        grid = proj.coords_grid(S, S)
        grid_lr = proj.coords_grid(S // 8, S // 8)[None]

        # Gradients do not flow through the pose across iterations
        # (reference `PoseRefiner.py:319-321`).
        Tij = jax.lax.stop_gradient(carry["Tij"])

        if cfg.lm_res == "eighth":
            # Everything pose-related lives on the 1/8 grid: the flow init is
            # the pose-induced flow of the subsampled depth directly.
            depth_lr = c["syn_depth"][:, 4::8, 4::8]
            K_lr = c["K_crop"] / 8.0
            reproj_lr, _ = lm_lib.pose_transform_coords(
                Tij, depth_lr + EPS, K_lr
            )
            coords_lr = jnp.where(
                (depth_lr > EPS)[..., None], reproj_lr, grid_lr
            )
        else:
            depths = c["syn_depth"] + EPS
            # Pose-induced flow initialization (reference 324-328).
            reproj, _ = lm_lib.pose_transform_coords(Tij, depths, c["K_crop"])
            flow_init = (reproj - grid[None]) * (c["syn_depth"] > EPS)[..., None]
            coords_lr = grid_lr + downsample_flow(flow_init, 8)

        # GRU flow update at 1/8 + convex upsample (reference 329).
        pyramid = corr_ops.CorrPyramid(
            levels=c["corr_levels"], h=S // 8, w=S // 8
        )
        h, coords_lr, flow_up = GRUFlowStep(
            cfg.corr_radius, dtype=cfg.compute_dtype,
            emit_full_flow=cfg.emit_full_flow, corr_impl=cfg.corr_impl,
            name="cf_step"
        )(carry["h"], c["inp"], pyramid, coords_lr, grid_lr)
        target = flow_up + grid[None] if cfg.emit_full_flow else None

        # Similarity weight from learned descriptors (reference 342-346):
        # w = exp(-|1 - <geofea1, warp(geofea2, target)>| / sigma) * (depth>0).
        if cfg.with_corr_weight:
            sigma = self.param("sigma", nn.initializers.ones, (1,))
            if cfg.corr_weight_res == "eighth":
                # TPU-first: the descriptor warp is a per-pixel gather — the
                # single most expensive op at full res (~20 ms/frame measured
                # across the 12 iterations). The descriptors are smooth deep
                # features, so the similarity is computed on the 1/8 grid
                # (where the flow lives) and bilinearly upsampled; the
                # reference-exact full-res path is `corr_weight_res='full'`.
                warped = bilinear_sample(c["geofea2_lr"], coords_lr)
                dot = jnp.sum(c["geofea1_lr"] * warped, axis=-1, keepdims=True)
                w_lr = jnp.exp(-jnp.abs(1.0 - dot) / sigma)
                # The full-res weight is only a diagnostic output and only
                # its LAST iteration survives (RefinerOutputs.weight) — the
                # scan emits the 1/8-grid weight and PoseRefiner upsamples
                # once after the loop instead of 12x inside it.
                # depth validity on the matching 1/8 grid.
                d_lr = c["syn_depth"][:, 4::8, 4::8]
                weight = w_lr * (d_lr > 0)[..., None].astype(w_lr.dtype)
            else:
                # Reference quirk reproduced exactly: `normalize_coords_grid`
                # maps pixels with the align_corners=True formula 2u/(S-1)-1
                # (`projective_ops.py:11-23`) but `F.grid_sample` reads it
                # with its align_corners=False default (`PoseRefiner.py:343`),
                # so the effective sample point is u*S/(S-1) - 0.5.
                tq = target * (S / (S - 1.0)) - 0.5
                warped = bilinear_sample(c["geofea2_crop"], tq)
                dot = jnp.sum(c["geofea1"] * warped, axis=-1, keepdims=True)
                weight = jnp.exp(-jnp.abs(1.0 - dot) / sigma)
                weight = weight * (c["syn_depth"] > 0)[..., None].astype(
                    weight.dtype
                )
        else:
            weight = (c["syn_depth"] > 0)[..., None].astype(flow_up.dtype)

        # Differentiable LM pose update (reference 349-350).
        if cfg.lm_res == "eighth":
            w_lr_full = (
                w_lr * (depth_lr > 0)[..., None].astype(w_lr.dtype)
                if cfg.with_corr_weight and cfg.corr_weight_res == "eighth"
                else (depth_lr > 0)[..., None].astype(coords_lr.dtype)
            )
            Tij = lm_lib.reprojection_optim(
                Tij,
                coords_lr,
                jnp.broadcast_to(w_lr_full, coords_lr.shape),
                jax.lax.stop_gradient(depth_lr) + EPS,
                jax.lax.stop_gradient(K_lr),
                num_iters=cfg.optim_iters,
                cfg=cfg.lm_config,
            )
        else:
            w_full = weight
            if w_full.shape[1] != S:
                # corr_weight_res='eighth' + lm_res='full': the LM needs the
                # weight on the full grid (the pre-r4 in-scan upsample).
                w_full = jax.image.resize(
                    w_full, (w_full.shape[0], S, S, 1), "bilinear"
                ) * (c["syn_depth"] > 0)[..., None].astype(w_full.dtype)
            Tij = lm_lib.reprojection_optim(
                Tij,
                target,
                jnp.broadcast_to(w_full, target.shape),
                jax.lax.stop_gradient(c["syn_depth"]) + EPS,
                jax.lax.stop_gradient(c["K_crop"]),
                num_iters=cfg.optim_iters,
                cfg=cfg.lm_config,
            )

        outs = {
            "flow": flow_up,
            "Tij": Tij,
            "weight": weight,
        }
        return {"Tij": Tij, "h": h}, outs


class PoseRefiner(nn.Module):
    """The recurrent 6-DoF refinement engine."""

    cfg: RefinerConfig = RefinerConfig()

    @nn.compact
    def __call__(
        self,
        image: jnp.ndarray,          # (B, H, W, 3) observed image, [0, 1]
        T_init: jnp.ndarray,         # (B, 4, 4) initial pose (model frame)
        intrinsics: jnp.ndarray,     # (B, 4) full-image intrinsics
        mesh: MeshAssets,
        ctx_fea_3d: jnp.ndarray,     # (B, V, C_ctx>=256) context features
        geofea_3d: Optional[jnp.ndarray],  # (B, V, C_geo) 3D descriptors
        geofea_2d: Optional[jnp.ndarray],  # (B, H, W, C_geo) 2D descriptors
        T_gt: Optional[jnp.ndarray] = None,  # (B, 4, 4) GT pose (for loss)
        emit_full_flow: Optional[bool] = None,  # static; default cfg value
        geofea_2d_scale: int = 1,    # geofea_2d is at 1/scale of `image`'s
                                     # resolution (SuperPoint half-res tail);
                                     # crop sampling scales accordingly
    ) -> RefinerOutputs:
        cfg = self.cfg
        if emit_full_flow is not None and emit_full_flow != cfg.emit_full_flow:
            cfg = dataclasses.replace(cfg, emit_full_flow=emit_full_flow)
        if not cfg.emit_full_flow and (
            cfg.lm_res != "eighth"
            or (cfg.with_corr_weight and cfg.corr_weight_res != "eighth")
        ):
            raise ValueError(
                "emit_full_flow=False requires the 1/8-grid LM and similarity"
            )
        if (
            cfg.lm_res == "eighth"
            and cfg.with_corr_weight
            and cfg.corr_weight_res != "eighth"
        ):
            raise ValueError(
                "lm_res='eighth' requires corr_weight_res='eighth' when "
                "similarity weighting is on"
            )
        B = image.shape[0]
        S = cfg.zoom_crop_size
        h_img, w_img = image.shape[1], image.shape[2]

        Ti = T_init
        Tij = jnp.broadcast_to(jnp.eye(4, dtype=T_init.dtype), T_init.shape)

        all_hist = []
        syn_depths = []
        use_geo = geofea_3d is not None and geofea_2d is not None

        # Submodules created once; weights are shared across render iterations.
        image_fea_enc = ImageFeaEncoder(
            dtype=cfg.compute_dtype, name="image_fea_enc"
        )
        step_cls = nn.remat(_InnerStep) if cfg.remat else _InnerStep
        inner_scan = nn.scan(
            step_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,   # loop-invariants are NOT carried/copied
            length=cfg.gru_iters,
            # See RefinerConfig.scan_unroll: unrolling was measured and
            # rejected (BENCHLOG r4 item 5) — the 0.86-vs-0.46 ms/iter
            # composed-vs-parts gap is genuine dataflow, not scan overhead.
            unroll=cfg.scan_unroll,
        )(cfg, name="inner")

        for ren_iter in range(cfg.render_iters):
            Ti = pmatmul(Tij, Ti)
            Tij = jnp.broadcast_to(jnp.eye(4, dtype=Ti.dtype), Ti.shape)
            Ti_render = jax.lax.stop_gradient(Ti)

            # Crop box from the projected-vertex bbox. The reference splats
            # vertices into a depth map at round(uv) and takes the mask bbox
            # (253-263, `diff_render_optim.py:369-402`); since round() is
            # monotone, min/max over the painted pixels equals round() of the
            # float min/max — the same integer box without the TPU-hostile
            # scatter. Rounding before the clamp reproduces the reference's
            # `.clamp(0, dim-1)` on scatter indices exactly.
            verts_cam = proj.transform_points(Ti_render, mesh.verts[None])
            uv_full, _ = proj.project(verts_cam, intrinsics[:, None, :])
            vvalid = (
                (mesh.vert_valid[None] > 0)
                & (verts_cam[..., 2] > proj.MIN_DEPTH)
            )
            big = 1e9
            x0 = jnp.min(jnp.where(vvalid, uv_full[..., 0], big), axis=1)
            y0 = jnp.min(jnp.where(vvalid, uv_full[..., 1], big), axis=1)
            x1 = jnp.max(jnp.where(vvalid, uv_full[..., 0], -big), axis=1)
            y1 = jnp.max(jnp.where(vvalid, uv_full[..., 1], -big), axis=1)
            none_valid = ~jnp.any(vvalid, axis=1)
            x0 = jnp.where(none_valid, 0.0, jnp.clip(jnp.round(x0), 0, w_img - 1))
            y0 = jnp.where(none_valid, 0.0, jnp.clip(jnp.round(y0), 0, h_img - 1))
            x1 = jnp.where(
                none_valid, float(w_img - 1), jnp.clip(jnp.round(x1), 0, w_img - 1)
            )
            y1 = jnp.where(
                none_valid, float(h_img - 1), jnp.clip(jnp.round(y1), 0, h_img - 1)
            )
            bbox = jnp.stack([x0, y0, x1, y1], axis=-1)

            # In-graph zoom-crop parameters + crop intrinsics (reference 263):
            # window centered on the projected model-frame origin
            # (`PoseRefiner.py:207-210`), sized by the max center->bbox-edge
            # distance, anisotropic by the full-image aspect ratio.
            t_obj = Ti_render[:, None, :3, 3]
            center_uv, _ = proj.project(t_obj, intrinsics[:, None, :])
            crop_params = crop_lib.reference_crop_params(
                center_uv[:, 0], bbox, cfg.margin_ratio,
                ratio=float(h_img) / float(w_img),
            )
            K_crop = jax.lax.stop_gradient(
                crop_lib.crop_intrinsics(intrinsics, crop_params, S)
            )

            # One rasterization: RGB + ctx features + 3D descriptors as vertex
            # attributes; z-buffer doubles as syn_depth (reference 269-304).
            attrs = [jnp.broadcast_to(mesh.colors[None], (B,) + mesh.colors.shape)]
            n_shade = 0
            if mesh.normals is not None:
                # Normals rotated to camera frame per batch item; rotation is
                # linear so per-vertex rotation + barycentric interpolation
                # equals interpolating then rotating (Phong-style shading,
                # reference `diff_render_optim.py:201-244`).
                R = jax.lax.stop_gradient(Ti_render[:, :3, :3])
                attrs.append(peinsum("bij,vj->bvi", R, mesh.normals))
                n_shade = 3
            face_keep = None
            compact_to = None
            if cfg.backface_cull and mesh.normals is not None:
                # Backface test in camera frame with a silhouette margin:
                # keep faces whose outward normal is within ~78deg of facing
                # the camera. A closed consistently-wound mesh has ~50%
                # backfaces every frame; the sweep is compacted to 5/8 F.
                R = jax.lax.stop_gradient(Ti_render[:, :3, :3])
                n_face = mesh.normals[mesh.faces].mean(axis=1)     # (F, 3)
                c_face = mesh.verts[mesh.faces].mean(axis=1)       # (F, 3)
                n_cam = peinsum("bij,fj->bfi", R, n_face)
                c_cam = proj.transform_points(Ti_render, c_face[None])
                dot = jnp.sum(n_cam * c_cam, axis=-1)
                norm = jnp.linalg.norm(n_cam, axis=-1) * jnp.maximum(
                    jnp.linalg.norm(c_cam, axis=-1), 1e-6
                )
                face_keep = dot < 0.2 * norm
                F_total = mesh.faces.shape[0]
                compact_to = (
                    (F_total * 5 // 8) // cfg.raster_chunk * cfg.raster_chunk
                )
            s8 = S // 8
            eighth = cfg.corr_weight_res == "eighth"

            # Attribute interpolation, split by consumer resolution. The
            # context features (256ch) and 3D descriptors (32ch) are consumed
            # on the 1/8 grid (GRU context + similarity weights), so in the
            # TPU-first 'eighth' mode they are interpolated ONLY at the 1/8
            # pixel grid — the full-res 294-channel gather was the single
            # hottest group of ops in device traces (~10 ms/frame). Full-res
            # interpolation is kept for RGB(+normals) and, in the
            # reference-exact 'full' mode, for everything.
            vis_attrs = jnp.concatenate(attrs, axis=-1)  # colors [+ normals]
            feat_list = [ctx_fea_3d]
            if use_geo:
                feat_list.append(geofea_3d)
            feat_attrs = jnp.concatenate(feat_list, axis=-1)
            c_ctx = ctx_fea_3d.shape[-1]

            fused = eighth and face_keep is None and S % 16 == 0
            if fused:
                # Fused raster + vis-attr interpolation (one Pallas kernel on
                # TPU): RGB(+normals) are mesh constants under a detached
                # pose, so the full-res interpolation needs no gradient and
                # no full-res barycentrics are ever materialized. The
                # gradient-carrying feature interpolation happens only on the
                # 1/8 grid via the one-hot matmul form.
                attr_vis, syn_depth, fid = rasterize_with_vis_attrs(
                    verts_cam, mesh.faces, K_crop, vis_attrs, S, S,
                    face_valid=mesh.face_valid, chunk=cfg.raster_chunk,
                )
                fid_lr = fid[:, 4::8, 4::8]
                gx = jnp.arange(s8, dtype=jnp.float32) * 8.0 + 4.0 + 0.5
                pix_xy = jnp.stack(
                    jnp.meshgrid(gx, gx, indexing="xy"), axis=-1
                )  # (s8, s8, 2) absolute crop-pixel centers of the 4::8 grid
                bary_lr = compute_bary(
                    verts_cam, mesh.faces, K_crop, fid_lr, pix_xy,
                    mesh.face_valid,
                )
                frags_lr = Fragments(
                    face_id=fid_lr, bary=bary_lr,
                    zbuf=syn_depth[:, 4::8, 4::8],
                )
            else:
                frags = rasterize(
                    verts_cam, mesh.faces, K_crop, S, S,
                    face_valid=mesh.face_valid, chunk=cfg.raster_chunk,
                    face_keep=face_keep, compact_to=compact_to,
                )
                syn_depth = frags.zbuf  # detached by rasterize
                attr_vis = interpolate_attributes(frags, mesh.faces, vis_attrs)
                if eighth:
                    frags_lr = Fragments(
                        face_id=frags.face_id[:, 4::8, 4::8],
                        bary=frags.bary[:, 4::8, 4::8],
                        zbuf=frags.zbuf[:, 4::8, 4::8],
                    )

            syn_img = attr_vis[..., :3]
            if n_shade:
                syn_img = headlight_shade(syn_img, attr_vis[..., 3:])

            if eighth:
                feat_lr = interpolate_attributes_onehot(
                    frags_lr, mesh.faces, feat_attrs
                )
                cfea_lr = feat_lr[..., :c_ctx] * cfg.feature_scale
                geofea1_lr = feat_lr[..., c_ctx:] if use_geo else None
                cfea_for_ctx = cfea_lr
                geofea1 = None
            else:
                attr_feat = interpolate_attributes(frags, mesh.faces, feat_attrs)
                cfea_crop = attr_feat[..., :c_ctx] * cfg.feature_scale
                geofea1 = attr_feat[..., c_ctx:] if use_geo else None
                cfea_for_ctx = cfea_crop

            # Observed crop + warped 2D descriptor crop (reference 287-291).
            image_crop = separable_crop_sample(image, crop_params, S)

            # Image features + correlation pyramid, built once per render iter
            # (reference 311, `CFNet.py:115-122` update_corr_fn=(i==0)).
            enc_scale = (1.0 / 255.0) if cfg.legacy_squash_255 else 1.0
            fmap1, fmap2 = image_fea_enc(
                syn_img * enc_scale, image_crop * enc_scale
            )
            pyramid = corr_ops.build_corr_pyramid(fmap1, fmap2, cfg.corr_levels)
            net, inp = split_context(
                cfea_for_ctx, cfg.hidden_dim, cfg.context_dim,
                cfg.compute_dtype, out_hw=(s8, s8),
            )

            carry = {"Tij": Tij, "h": net}
            inv = {
                "inp": inp,
                "corr_levels": pyramid.levels,
                "syn_depth": syn_depth,
                "K_crop": K_crop,
            }
            # geofea_2d may live at 1/scale of the image resolution (the
            # SuperPoint half-res tail). With grid_sample's align_corners=
            # False convention, u_lowres = (u_full + 0.5)/scale - 0.5, and
            # separable_crop_sample applies its own -0.5 AFTER the window
            # map — so dividing the crop params by `scale` is EXACT.
            cp_geo = crop_params / float(geofea_2d_scale)
            if use_geo and eighth:
                # Descriptor similarity evaluated on the 1/8 grid: the 2D
                # descriptor crop is sampled directly at the coarse grid and
                # the rendered 3D descriptors interpolated there.
                inv["geofea2_lr"] = separable_crop_sample(
                    geofea_2d, cp_geo, s8
                )
                inv["geofea1_lr"] = geofea1_lr
            elif use_geo:
                inv["geofea1"] = geofea1
                inv["geofea2_crop"] = separable_crop_sample(
                    geofea_2d, cp_geo, S
                )
            elif cfg.with_corr_weight:
                raise ValueError(
                    "with_corr_weight requires geofea_2d/geofea_3d inputs"
                )
            carry, hist = inner_scan(carry, inv)
            Tij = carry["Tij"]

            # Per-iteration GT relative pose + bookkeeping (reference 356-362).
            Ti_sg = jax.lax.stop_gradient(Ti)
            hist["Ti"] = jnp.broadcast_to(Ti_sg, (cfg.gru_iters,) + Ti.shape)
            if T_gt is not None:
                Tij_gt = jax.lax.stop_gradient(
                    pmatmul(T_gt, se3_lib.se3_inverse(Ti_sg))
                )
            else:
                Tij_gt = jnp.broadcast_to(jnp.eye(4, dtype=Ti.dtype), Ti.shape)
            hist["Tij_gt"] = jnp.broadcast_to(
                Tij_gt, (cfg.gru_iters,) + Tij_gt.shape
            )
            hist["K_crop"] = jnp.broadcast_to(
                K_crop, (cfg.gru_iters,) + K_crop.shape
            )
            all_hist.append(hist)
            syn_depths.append(syn_depth)

        Ti = pmatmul(Tij, Ti)

        cat = lambda key: jnp.concatenate([h[key] for h in all_hist], axis=0)
        last_weight = all_hist[-1]["weight"][-1]
        if last_weight.shape[1] != S:
            # eighth-res similarity: one diagnostic upsample after the loop
            # (the scan emits 1/8-grid weights; see _InnerStep).
            last_weight = jax.image.resize(
                last_weight, (last_weight.shape[0], S, S, 1), "bilinear"
            ) * (syn_depth > 0)[..., None].astype(last_weight.dtype)
        return RefinerOutputs(
            Ti_pred=Ti,
            Tij=Tij,
            flow_history=cat("flow"),
            Tij_history=cat("Tij"),
            Ti_history=cat("Ti"),
            Tij_gt_history=cat("Tij_gt"),
            intrinsics_history=cat("K_crop"),
            syn_depth_history=jnp.stack(syn_depths, axis=0),
            weight=last_weight,
            syn_img=syn_img,
            image_crop=image_crop,
            valid_mask=(syn_depth > 0).astype(image.dtype),
        )
