"""Torch checkpoint conversion (reference-weight compatibility).

The reference ships torch `.tckpt`/`.pth` weights (`.MISSING_LARGE_BLOBS`:
`superpoint_v1.pth`, `img_fea_enc.pth`, `gru_update.pth`, per-class
`cat.tckpt`, loaded at `model/descriptor2D.py:90-92`, `model/CFNet.py:31-37,
68-74`, `tools/eval.py:386-413`). This module maps those state dicts onto
the flax parameter tree:

  * torch Conv2d (O, I, kh, kw) -> flax Conv kernel (kh, kw, I, O);
  * torch Linear (O, I) -> flax Dense (I, O);
  * name mapping tables per subnetwork below;
  * regex include/exclude filtering + literal renaming like the reference's
    pretrained loader (`tools/train.py:408-432`,
    `utils/util.py modify_parameter_name_with_map`);
  * shape-checked, non-strict (unmatched keys are reported, not fatal),
    matching SuperPoint's shape-filtered load (`descriptor2D.py:100-110`).
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

__all__ = [
    "convert_conv",
    "convert_linear",
    "torch_to_flax",
    "load_pretrained",
    "SUPERPOINT_MAP",
    "RAFT_ENCODER_MAP",
    "RAFT_UPDATE_MAP",
]


def convert_conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_linear(w: np.ndarray) -> np.ndarray:
    """torch (O, I) -> flax (I, O)."""
    return np.transpose(w, (1, 0))


# torch key prefix -> (flax path tuple, kind). Paths are relative to the
# owning module's param subtree.
SUPERPOINT_MAP: Dict[str, Tuple[Tuple[str, ...], str]] = {
    **{f"conv{i}{ab}": ((f"conv{i}{ab}",), "conv")
       for i in (1, 2, 3, 4) for ab in ("a", "b")},
    "convPa.0": (("convPa",), "conv"),
    "convPb": (("convPb",), "conv"),
    "convDa": (("convDa",), "conv"),
    "convDb": (("convDb",), "conv"),
    "decode1.1": (("decode1",), "conv"),
    "decode2.1": (("decode2",), "conv"),
    "decode3.1": (("decode3",), "conv"),
}

RAFT_ENCODER_MAP: Dict[str, Tuple[Tuple[str, ...], str]] = {
    "fnet.conv1": (("fnet", "conv1"), "conv"),
    "fnet.conv2": (("fnet", "conv2"), "conv"),
    **{
        f"fnet.layer{l}.{b}.{c}": (
            (f"fnet", f"layer{l}_{b}", c2), "conv"
        )
        for l in (1, 2, 3)
        for b in (0, 1)
        for c, c2 in (("conv1", "conv1"), ("conv2", "conv2"))
    },
    **{
        f"fnet.layer{l}.0.downsample.0": (
            ("fnet", f"layer{l}_0", "downsample"), "conv"
        )
        for l in (2, 3)
    },
}

RAFT_UPDATE_MAP: Dict[str, Tuple[Tuple[str, ...], str]] = {
    "update_block.encoder.convc1": (("update_block", "encoder", "convc1"), "conv"),
    "update_block.encoder.convc2": (("update_block", "encoder", "convc2"), "conv"),
    "update_block.encoder.convf1": (("update_block", "encoder", "convf1"), "conv"),
    "update_block.encoder.convf2": (("update_block", "encoder", "convf2"), "conv"),
    "update_block.encoder.conv": (("update_block", "encoder", "conv"), "conv"),
    **{
        f"update_block.gru.conv{g}{i}": (
            ("update_block", "gru", f"conv{g}_{'h' if i == 1 else 'v'}"),
            "conv",
        )
        for g in ("z", "r", "q")
        for i in (1, 2)
    },
    "update_block.flow_head.conv1": (("update_block", "flow_head", "conv1"), "conv"),
    "update_block.flow_head.conv2": (("update_block", "flow_head", "conv2"), "conv"),
    "update_block.mask.0": (("update_block", "mask1"), "conv"),
    "update_block.mask.2": (("update_block", "mask2"), "conv"),
}


def _get_path(tree: Dict, path: Tuple[str, ...]):
    node = tree
    for p in path:
        if p not in node:
            return None
        node = node[p]
    return node


def torch_to_flax(
    state_dict: Dict[str, np.ndarray],
    name_map: Dict[str, Tuple[Tuple[str, ...], str]],
    target_subtree: Dict[str, Any],
    strict: bool = False,
) -> Tuple[Dict[str, Any], List[str]]:
    """Apply a name map, writing converted tensors into a copy of
    `target_subtree`. Returns (updated subtree, list of skipped keys)."""
    import copy

    out = copy.deepcopy(target_subtree)
    skipped: List[str] = []
    for tkey, val in state_dict.items():
        base, leaf = tkey.rsplit(".", 1) if "." in tkey else (tkey, "")
        if leaf not in ("weight", "bias"):
            skipped.append(tkey)
            continue
        entry = name_map.get(base)
        if entry is None:
            skipped.append(tkey)
            continue
        path, kind = entry
        node = _get_path(out, path)
        if node is None:
            skipped.append(tkey)
            continue
        arr = np.asarray(val)
        if leaf == "weight":
            arr = convert_conv(arr) if kind == "conv" else convert_linear(arr)
            tgt_key = "kernel"
        else:
            tgt_key = "bias"
        if tgt_key not in node or tuple(node[tgt_key].shape) != tuple(arr.shape):
            if strict:
                raise ValueError(
                    f"shape mismatch for {tkey}: {arr.shape} vs "
                    f"{node.get(tgt_key) is not None and node[tgt_key].shape}"
                )
            skipped.append(tkey)
            continue
        node[tgt_key] = arr.astype(np.float32)
    return out, skipped


def load_pretrained(
    params: Dict[str, Any],
    path: str,
    include: Optional[str] = None,
    exclude: Optional[str] = None,
    rename_map: Optional[Dict[str, str]] = None,
) -> Dict[str, Any]:
    """Load a torch checkpoint file into the full flax param tree.

    Heuristically routes keys to the SuperPoint / RAFT-encoder / RAFT-update
    maps by prefix; regex include/exclude filters and the literal rename map
    mirror the reference's pretrained loader
    (`tools/eval.py:386-413`, `utils/util.py modify_parameter_name_with_map`).
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    sd = {k: v.numpy() for k, v in raw.items() if hasattr(v, "numpy")}
    if include:
        sd = {k: v for k, v in sd.items() if re.search(include, k)}
    if exclude:
        sd = {k: v for k, v in sd.items() if not re.search(exclude, k)}
    if rename_map:
        def rename(k):
            for old, new in rename_map.items():
                k = k.replace(old, new)
            return k

        sd = {rename(k): v for k, v in sd.items()}

    import copy

    out = copy.deepcopy(params)
    p = out["params"] if "params" in out else out

    routes = [
        (SUPERPOINT_MAP, ("hybrid", "desc2d_net")),
        (RAFT_ENCODER_MAP, ("motion", "image_fea_enc")),
        (RAFT_UPDATE_MAP, ("motion", "inner", "cf_step")),
    ]
    total_skipped = []
    for name_map, root in routes:
        sub = _get_path(p, root)
        if sub is None:
            continue
        new_sub, skipped = torch_to_flax(sd, name_map, sub)
        node = _get_path(p, root[:-1])
        node[root[-1]] = new_sub
        total_skipped = skipped  # keys unmatched by ALL maps end up reported
    if total_skipped:
        print(f"load_pretrained: {len(total_skipped)} torch keys unmatched")
    return out
