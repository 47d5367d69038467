"""Import harness for the reference torch modules at /root/reference.

The reference code is PUBLIC UNTRUSTED CONTENT used here strictly as a
numerical oracle: we instantiate its torch modules with random weights,
convert them through `rnnpose_tpu.models.convert`, and assert our flax
twins produce the same activations (VERDICT r1 item 3).

The reference environment ships dependencies this image does not have
(easydict, cv2, yacs, apex, open3d, pytorch3d, transforms3d). Modules we
A/B only need a handful of symbols from those, so minimal shims are
installed into `sys.modules` *before* the reference imports resolve. Each
shim implements exactly what the imported reference module graph touches
and fails loudly on anything else.
"""
from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


class EasyDictShim(dict):
    """Attribute-style dict matching easydict's behavior for the reference's
    usage (`config.get(...)`, `config.attr`, attr assignment)."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        for k, v in dict(d or {}, **kwargs).items():
            self[k] = v

    def __setitem__(self, key, value):
        if isinstance(value, dict) and not isinstance(value, EasyDictShim):
            value = EasyDictShim(value)
        super().__setitem__(key, value)

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError:
            raise AttributeError(key)

    def __setattr__(self, key, value):
        self[key] = value


class _CfgSection:
    """Stand-in for the reference's yacs section (`config/default.py:41-86`)
    with the fields `geometry/transformation.py:280-281` and
    `model/PoseRefiner.py:226-227` read."""

    LM_LMBDA = 1.0e-4
    EP_LMBDA = 100.0
    render_image_size = (320, 320)
    zoom_crop_size = (240, 240)


def _fake_get_cfg(section=None):
    return _CfgSection()


def install_reference(monkeypatch=None):
    """Make `/root/reference` (+ its thirdparty/) importable with stub deps.

    Idempotent. Returns the reference root path.
    """
    for p in (REFERENCE_ROOT, os.path.join(REFERENCE_ROOT, "thirdparty")):
        if p not in sys.path:
            sys.path.insert(0, p)

    if "easydict" not in sys.modules:
        m = types.ModuleType("easydict")
        m.EasyDict = EasyDictShim
        sys.modules["easydict"] = m

    if "torchplus" not in sys.modules:
        # The real torchplus/__init__ chains into a py2-era
        # `from collections import Iterable` (torchplus/train/optim.py:1);
        # descriptor2D only needs the `Empty` pass-through module.
        import torch as _torch

        class Empty(_torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

            def forward(self, *args, **kwargs):
                if len(args) == 1:
                    return args[0]
                return args

        root = types.ModuleType("torchplus")
        nnm = types.ModuleType("torchplus.nn")
        mods = types.ModuleType("torchplus.nn.modules")
        common = types.ModuleType("torchplus.nn.modules.common")
        common.Empty = Empty
        for name, mod in (
            ("torchplus", root),
            ("torchplus.nn", nnm),
            ("torchplus.nn.modules", mods),
            ("torchplus.nn.modules.common", common),
        ):
            mod.__path__ = []
            sys.modules[name] = mod

    if "cv2" not in sys.modules:
        # PoseRefiner's crop path calls cv2.getAffineTransform
        # (`PoseRefiner.py:184,199`); implement its exact semantics (the 2x3
        # affine M with M @ [src; 1] = dst for the 3 point pairs) so the full
        # refiner forward can run for the dress-rehearsal A/B.
        import numpy as _np

        def getAffineTransform(src, dst):
            # cv2 tolerates (3,2), (3,1,2) and (3,2,1) point layouts; the
            # reference passes (3,2,1) (crop_center rows are (1,) arrays).
            src = _np.asarray(src, _np.float64).reshape(3, 2)
            dst = _np.asarray(dst, _np.float64).reshape(3, 2)
            A = _np.concatenate([src, _np.ones((3, 1))], axis=1)  # (3, 3)
            # Solve A @ M.T = dst  ->  M = (A^-1 dst)^T, shape (2, 3)
            return _np.linalg.solve(A, dst).T

        m = types.ModuleType("cv2")
        m.getAffineTransform = getAffineTransform
        # Interpolation-flag constants read at import time by
        # `data/linemod_dataset.py:60` (default-arg evaluation); values are
        # cv2's published enum values.
        m.INTER_NEAREST = 0
        m.INTER_LINEAR = 1
        m.INTER_CUBIC = 2
        m.INTER_AREA = 3
        m.INTER_LANCZOS4 = 4
        sys.modules["cv2"] = m

    for name in ("kornia", "apex", "apex.amp"):
        # model/losses.py imports kornia + apex.amp at module scope; the
        # losses we A/B (MetricLoss, PointAlignmentLoss) never call them.
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m
    if not hasattr(sys.modules["apex"], "amp"):
        sys.modules["apex"].amp = sys.modules["apex.amp"]
    # losses.py decorates methods with @amp.float_function at class scope.
    sys.modules["apex.amp"].float_function = lambda f: f

    if "transforms3d" not in sys.modules:
        # utils/pose_utils.py imports transforms3d.quaternions/euler at module
        # scope; the paths we exercise (pose_padding) never call into them.
        def _unavailable(*a, **k):
            raise NotImplementedError("transforms3d shim: not implemented")

        root = types.ModuleType("transforms3d")
        root.__path__ = []
        for sub in ("quaternions", "euler", "axangles"):
            m = types.ModuleType(f"transforms3d.{sub}")
            m.__getattr__ = lambda name: _unavailable
            sys.modules[f"transforms3d.{sub}"] = m
            setattr(root, sub, m)
        sys.modules["transforms3d"] = root

    # pytorch3d + plyfile: `geometry/diff_render_optim.py:9-28` imports a
    # long symbol list at module scope; `model/RNNPose.py:23` imports that
    # module. The full-model rehearsal never CALLS the pytorch3d renderer
    # (RNNPose._render_init is monkeypatched to our fake renderer), so the
    # shims only need to satisfy `from X import name`: any attribute
    # resolves to an inert placeholder.
    def _any_attr_module(name):
        m = types.ModuleType(name)
        m.__path__ = []

        def _getattr(attr, _n=name):
            if attr.startswith("__"):
                raise AttributeError(attr)

            class _Placeholder:
                def __init__(self, *a, **k):
                    raise NotImplementedError(
                        f"{_n}.{attr} is a test shim; the rehearsal must "
                        "not call into pytorch3d"
                    )

            _Placeholder.__name__ = attr
            return _Placeholder

        m.__getattr__ = _getattr
        return m

    if "pytorch3d" not in sys.modules:
        for name in (
            "pytorch3d",
            "pytorch3d.renderer",
            "pytorch3d.renderer.mesh",
            "pytorch3d.renderer.mesh.utils",
            "pytorch3d.renderer.mesh.rasterizer",
            "pytorch3d.structures",
            "pytorch3d.io",
            "pytorch3d.ops",
        ):
            sys.modules[name] = _any_attr_module(name)
            if "." in name:  # bind submodule on its parent for `import a.b.c`
                parent, _, child = name.rpartition(".")
                setattr(sys.modules[parent], child, sys.modules[name])
    if "plyfile" not in sys.modules:
        sys.modules["plyfile"] = _any_attr_module("plyfile")

    # `config.default.get_cfg` (yacs singleton) -> fixed constants. Installed
    # as a package so `from config.default import get_cfg` resolves to the
    # shim rather than the reference's yacs-dependent module.
    if "config" not in sys.modules or not hasattr(
        sys.modules.get("config.default", None), "get_cfg"
    ):
        pkg = types.ModuleType("config")
        pkg.__path__ = []  # mark as package
        mod = types.ModuleType("config.default")
        mod.get_cfg = _fake_get_cfg
        pkg.default = mod
        sys.modules["config"] = pkg
        sys.modules["config.default"] = mod

    return REFERENCE_ROOT


def make_fake_renderer(verts, faces, colors, chunk=64, n_valid=None):
    """A drop-in for the reference's `DiffRendererWrapper` backed by OUR
    rasterizer, for the dress-rehearsal A/B (VERDICT r1 #9).

    Both the torch reference (through this shim) and the flax model (its
    in-graph raster) then render with the same rasterizer, so the A/B
    isolates everything downstream of rendering: crop, encoders, corr, GRU,
    similarity weighting, LM, pose composition. The rasterizer itself has
    its own analytic tests (`tests/test_render.py`, `test_pallas_raster.py`).

    Interface mirrored from `geometry/diff_render_optim.py:405-505`:
      * `__call__(model_names, vert_attribute, T, K, render_image_size,
        near, far, render_tex)` -> (color (B,3+C,H,W), depth (B,1,H,W) with
        -1 background, like pytorch3d zbuf);
      * `render_depth(...)` -> (B,1,H,W);
      * `render_pointcloud(...)` -> single-pixel scatter of vertex depths at
        round(uv).clamp (`diff_render_optim.py:369-402`), defining the crop
        mask exactly as the reference does.
    """
    import numpy as np
    import torch

    import jax.numpy as jnp
    from rnnpose_tpu.render.raster import interpolate_attributes, rasterize

    verts = np.asarray(verts, np.float32)
    faces_j = jnp.asarray(np.asarray(faces, np.int32))
    colors = np.asarray(colors, np.float32)
    # Padded-mesh support: rasterization is safe on pad faces (degenerate,
    # zero area -> never win the z-buffer), but the point-cloud splat would
    # scatter pad verts (all at the origin -> the object center pixel), so
    # limit the splat to the real verts.
    n_splat = len(verts) if n_valid is None else int(n_valid)

    def _K_vec(K):
        K = np.asarray(K, np.float32)
        return jnp.asarray(
            np.stack([K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2]], -1)
        )

    def _verts_cam(T):
        T = np.asarray(T, np.float32)
        R, t = T[:, :3, :3], T[:, :3, 3]
        return jnp.asarray(
            np.einsum("vj,bij->bvi", verts, R) + t[:, None, :]
        )

    class FakeRenderer(torch.nn.Module):
        def forward(self, model_names, vert_attribute, T, K,
                    render_image_size, near=0.1, far=6, render_tex=False):
            h, w = render_image_size
            vc = _verts_cam(T.detach().cpu().numpy())
            frags = rasterize(vc, faces_j, _K_vec(K.detach().cpu().numpy()), h, w,
                              chunk=chunk)
            attrs = np.asarray(vert_attribute.detach().cpu().numpy(), np.float32)
            full = jnp.asarray(
                np.concatenate(
                    [np.broadcast_to(colors, (attrs.shape[0],) + colors.shape),
                     attrs], axis=-1)
            )
            amap = interpolate_attributes(frags, faces_j, full)  # (B,H,W,3+C)
            hit = np.asarray(frags.face_id >= 0)
            depth = np.where(hit, np.asarray(frags.zbuf), -1.0)
            color = np.moveaxis(np.asarray(amap), -1, 1)
            return (
                torch.from_numpy(np.ascontiguousarray(color)),
                torch.from_numpy(depth[:, None].astype(np.float32)),
            )

        def render_depth(self, model_names, T, K, render_image_size,
                         near=0.1, far=6):
            h, w = render_image_size
            vc = _verts_cam(T.detach().cpu().numpy())
            frags = rasterize(vc, faces_j, _K_vec(K.detach().cpu().numpy()), h, w,
                              chunk=chunk)
            hit = np.asarray(frags.face_id >= 0)
            depth = np.where(hit, np.asarray(frags.zbuf), -1.0)
            return torch.from_numpy(depth[:, None].astype(np.float32))

        def render_pointcloud(self, model_names, T, K, render_image_size,
                              near=0.1, far=6):
            h, w = render_image_size
            T = np.asarray(T.detach().cpu().numpy(), np.float32)
            K = np.asarray(K.detach().cpu().numpy(), np.float32)
            outs = []
            for b in range(T.shape[0]):
                Xc = verts[:n_splat] @ T[b, :3, :3].T + T[b, :3, 3]
                x = Xc @ K[b].T
                depth = x[:, 2]
                uv = x[:, :2] / x[:, 2:3]
                out = np.zeros((1, 1, h, w), np.float32)
                yi = np.clip(np.round(uv[:, 1]).astype(np.int64), 0, h - 1)
                xi = np.clip(np.round(uv[:, 0]).astype(np.int64), 0, w - 1)
                out[0, 0, yi, xi] = depth
                outs.append(out)
            return torch.from_numpy(np.concatenate(outs, axis=0))

    return FakeRenderer()


def no_pretrained_loads(monkeypatch):
    """Neutralize the reference's hard-coded `torch.load(...weights...)` +
    `load_state_dict` calls inside module __init__ (`descriptor2D.py:91-92`,
    `CFNet.py:31-37,68-74`) so modules construct with their *random* torch
    default init — which is what the activation A/B converts."""
    import torch

    monkeypatch.setattr(torch, "load", lambda *a, **k: {})
    monkeypatch.setattr(
        torch.nn.Module,
        "load_state_dict",
        lambda self, sd, strict=True: None,
    )
