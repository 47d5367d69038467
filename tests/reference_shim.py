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
        # PoseRefiner imports cv2 at module scope but the paths we exercise
        # never call into it.
        sys.modules["cv2"] = types.ModuleType("cv2")

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
