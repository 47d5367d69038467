"""Torch checkpoint conversion (reference-weight compatibility).

The reference ships torch `.tckpt`/`.pth` weights (`.MISSING_LARGE_BLOBS`:
`superpoint_v1.pth`, `img_fea_enc.pth`, `gru_update.pth`, per-class
`cat.tckpt`, loaded at `model/descriptor2D.py:90-92`, `model/CFNet.py:31-37,
68-74`, `tools/eval.py:386-413`). This module maps those state dicts onto
the flax parameter tree:

  * torch Conv2d (O, I, kh, kw) -> flax Conv kernel (kh, kw, I, O);
  * torch Linear/no-bias mlp (O, I) -> flax Dense (I, O);
  * torch Conv1d k=1 (O, I, 1) -> flax Dense (I, O) (the reference's
    bottleneck/proj 1x1 convs, `model/descriptor3D.py:91-94`);
  * KPConv kernel weights [K, Cin, Cout] and per-layer kernel-point
    dispositions copied verbatim (`kpconv_blocks.py:177,99`);
  * the full-model `.tckpt` key prefixes of `model/RNNPose.py:61-100`
    (`hybrid_desc_net.corr_fea_extractor_{2d,3d}`,
    `ctx_fea_net.context_fea_extractor_3d`, `motion_net.{sigma,
    image_fea_enc,cf_net}`), including the learnable sigma
    (`model/PoseRefiner.py:76`);
  * regex include/exclude filtering + literal renaming like the reference's
    pretrained loader (`tools/eval.py:386-413`,
    `utils/util.py modify_parameter_name_with_map`);
  * shape-checked, non-strict (unmatched keys are reported, not fatal),
    matching SuperPoint's shape-filtered load (`descriptor2D.py:100-110`).

Keys with no parameter on our side are deliberately ignored (reported
separately): the unused `epsilon` scalar (`descriptor3D.py:40`, never read
in forward), the `global_step` buffer (`RNNPose.py:84-94`), and any norm
running statistics (the reference's norms are instance norms without
affine/state).
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
    "load_full_checkpoint",
    "full_model_routes",
    "kpconv_tower_map",
    "SUPERPOINT_MAP",
    "RAFT_ENCODER_MAP",
    "RAFT_UPDATE_MAP",
    "IGNORED_KEY_PATTERNS",
]


def convert_conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_linear(w: np.ndarray) -> np.ndarray:
    """torch (O, I) -> flax (I, O)."""
    return np.transpose(w, (1, 0))


def convert_conv1d(w: np.ndarray) -> np.ndarray:
    """torch Conv1d k=1 (O, I, 1) -> flax Dense (I, O)."""
    return np.transpose(w[..., 0], (1, 0))


# ---------------------------------------------------------------------------
# Name maps.
#
# Two entry styles coexist in one dict:
#   * base-keyed:  "conv1a" -> ((flax module path...), kind) with kind in
#     {"conv", "linear", "conv1d"}; applies to both `.weight` and `.bias`.
#   * full-keyed:  "encoder_blocks.0.KPConv.weights" ->
#     ((flax path incl. leaf...), kind) with kind in {"direct", "linear_w"}.
# Paths are relative to the owning module's param subtree.
# ---------------------------------------------------------------------------

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

# sigma lives in the refiner's inner-step module
# (reference: `motion_net.sigma.0`, `model/PoseRefiner.py:76`).
REFINER_MAP: Dict[str, Tuple[Tuple[str, ...], str]] = {
    "sigma.0": (("sigma",), "direct"),
}

# Keys the flax model deliberately has no parameter for.
IGNORED_KEY_PATTERNS: Tuple[str, ...] = (
    r"(^|\.)epsilon$",          # unused scalar, `descriptor3D.py:40`
    r"(^|\.)global_step$",      # step buffer, `RNNPose.py:84-94`
    r"running_(mean|var)$",
    r"num_batches_tracked$",
)


def kpconv_tower_map(num_layers: int = 4) -> Dict[str, Tuple[Tuple[str, ...], str]]:
    """Name map for one `KPSuperpoint3Dv2` tower (`model/descriptor3D.py`).

    Reference encoder block list for L layers (`descriptor3D.py:16-29`):
      0: simple, 1: resnetb, then (strided, resnetb, resnetb) per extra layer.
    Decoder: (nearest_upsample, unary) x (L-2), nearest_upsample, last_unary;
    upsample blocks have no params, so torch indices 1,3,...,2L-3.
    Flax module names per `models/kpconv_net.KPFCNN`.
    """
    m: Dict[str, Tuple[Tuple[str, ...], str]] = {}

    def kpconv(prefix: str, flax_name: str) -> None:
        m[f"{prefix}.KPConv.weights"] = (
            (flax_name, "KPConv", "weights"), "direct")
        m[f"{prefix}.KPConv.kernel_points"] = (
            (flax_name, "KPConv", "kernel_points"), "direct")

    def resblock(prefix: str, flax_name: str) -> None:
        kpconv(prefix, flax_name)
        for u in ("unary1", "unary2", "unary_shortcut"):
            m[f"{prefix}.{u}.mlp.weight"] = (
                (flax_name, u, "mlp", "kernel"), "linear_w")

    kpconv("encoder_blocks.0", "enc_simple")
    resblock("encoder_blocks.1", "enc_resnetb_0")
    i = 2
    for layer in range(1, num_layers):
        resblock(f"encoder_blocks.{i}", f"enc_strided_{layer}"); i += 1
        resblock(f"encoder_blocks.{i}", f"enc_resnetb_{layer}a"); i += 1
        resblock(f"encoder_blocks.{i}", f"enc_resnetb_{layer}b"); i += 1

    m["bottle"] = (("bottle",), "conv1d")
    m["proj_gnn"] = (("proj_gnn",), "conv1d")

    for j in range(num_layers - 2):
        m[f"decoder_blocks.{2 * j + 1}.mlp.weight"] = (
            (f"dec_unary_{j}", "mlp", "kernel"), "linear_w")
    m[f"decoder_blocks.{2 * (num_layers - 2) + 1}.mlp.weight"] = (
        ("last_unary", "kernel"), "linear_w")
    return m


def full_model_routes(num_layers: int = 4):
    """(torch key prefix, name map, flax path from the params root) triples
    covering the full reference RNNPose state dict (`model/RNNPose.py:61-100`,
    `model/HybridNet.py:29-69`, `model/PoseRefiner.py:76-100`)."""
    tower = kpconv_tower_map(num_layers)
    return [
        ("hybrid_desc_net.corr_fea_extractor_2d.", SUPERPOINT_MAP,
         ("hybrid", "desc2d")),
        ("hybrid_desc_net.corr_fea_extractor_3d.", tower,
         ("hybrid", "desc3d")),
        ("ctx_fea_net.context_fea_extractor_3d.", tower,
         ("ctx", "ctx3d")),
        ("motion_net.image_fea_enc.", RAFT_ENCODER_MAP,
         ("motion", "image_fea_enc")),
        ("motion_net.cf_net.", RAFT_UPDATE_MAP,
         ("motion", "inner", "cf_step")),
        ("motion_net.", REFINER_MAP, ("motion", "inner")),
    ]


def _get_path(tree: Dict, path: Tuple[str, ...]):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


_WEIGHT_KINDS = {
    "conv": convert_conv,
    "linear": convert_linear,
    "conv1d": convert_conv1d,
}
_FULL_KINDS = {
    "direct": lambda a: a,
    "linear_w": convert_linear,
}


def _convert_one(
    tkey: str,
    arr: np.ndarray,
    name_map: Dict[str, Tuple[Tuple[str, ...], str]],
) -> Optional[Tuple[Tuple[str, ...], np.ndarray]]:
    """Resolve one torch key to (flax path incl. leaf, converted array).

    Returns None when the key has no entry in this map.
    """
    ent = name_map.get(tkey)
    if ent is not None and ent[1] in _FULL_KINDS:
        path, kind = ent
        return path, _FULL_KINDS[kind](arr)
    base, leaf = tkey.rsplit(".", 1) if "." in tkey else (tkey, "")
    if leaf not in ("weight", "bias"):
        return None
    ent = name_map.get(base)
    if ent is None or ent[1] not in _WEIGHT_KINDS:
        return None
    path, kind = ent
    if leaf == "weight":
        return path + ("kernel",), _WEIGHT_KINDS[kind](arr)
    return path + ("bias",), arr


def _write_leaf(tree: Dict, path: Tuple[str, ...], arr: np.ndarray,
                strict: bool) -> bool:
    node = _get_path(tree, path[:-1])
    leaf = path[-1]
    if node is None or leaf not in node:
        if strict:
            raise KeyError(f"no flax param at {'/'.join(path)}")
        return False
    if tuple(node[leaf].shape) != tuple(arr.shape):
        if strict:
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: "
                f"{tuple(arr.shape)} vs {tuple(node[leaf].shape)}"
            )
        return False
    node[leaf] = arr.astype(np.float32)
    return True


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
        res = _convert_one(tkey, np.asarray(val), name_map)
        if res is None:
            skipped.append(tkey)
            continue
        path, arr = res
        if not _write_leaf(out, path, arr, strict):
            skipped.append(tkey)
    return out, skipped


def _is_ignored(tkey: str) -> bool:
    return any(re.search(p, tkey) for p in IGNORED_KEY_PATTERNS)


def load_full_checkpoint(
    params: Dict[str, Any],
    state_dict: Dict[str, np.ndarray],
    num_layers: int = 4,
    strict: bool = False,
) -> Tuple[Dict[str, Any], List[str], List[str]]:
    """Convert a full reference `.tckpt` state dict into the flax param tree.

    Returns (new params, skipped keys, ignored keys). With `strict=True` a
    non-ignored key that fails to route/convert raises.
    """
    import copy

    out = copy.deepcopy(params)
    p = out["params"] if "params" in out else out

    routes = full_model_routes(num_layers)
    skipped: List[str] = []
    ignored: List[str] = []
    for tkey, val in state_dict.items():
        if _is_ignored(tkey):
            ignored.append(tkey)
            continue
        placed = False
        for prefix, name_map, root in routes:
            if not tkey.startswith(prefix):
                continue
            res = _convert_one(tkey[len(prefix):], np.asarray(val), name_map)
            if res is None:
                continue
            path, arr = res
            sub = _get_path(p, root)
            if sub is None:
                continue
            if _write_leaf(sub, path, arr, strict):
                placed = True
                break
        if not placed:
            if strict:
                raise KeyError(f"unroutable torch key: {tkey}")
            skipped.append(tkey)
    if skipped:
        print(f"load_full_checkpoint: {len(skipped)} torch keys unmatched: "
              f"{skipped[:8]}{'...' if len(skipped) > 8 else ''}")
    return out, skipped, ignored


_INVERSE_WEIGHT = {
    "conv": lambda a: np.transpose(a, (3, 2, 0, 1)),
    "linear": lambda a: np.transpose(a, (1, 0)),
    "conv1d": lambda a: np.transpose(a, (1, 0))[..., None],
}
_INVERSE_FULL = {
    "direct": lambda a: a,
    "linear_w": lambda a: np.transpose(a, (1, 0)),
}


def export_reference_state_dict(
    params: Dict[str, Any], num_layers: int = 4
) -> Dict[str, np.ndarray]:
    """Emit a reference-shaped torch state dict from the flax param tree.

    Exact inverse of `load_full_checkpoint` over the full-model routes: every
    flax leaf reachable through a route becomes a torch-keyed, torch-shaped
    array. Used to fabricate reference-shaped checkpoints for round-trip /
    dress-rehearsal tests, and to export trained weights back into the
    reference's format.
    """
    p = params["params"] if "params" in params else params
    sd: Dict[str, np.ndarray] = {}
    for prefix, name_map, root in full_model_routes(num_layers):
        sub = _get_path(p, root)
        if sub is None:
            continue
        for tbase, (path, kind) in name_map.items():
            if kind in _INVERSE_FULL:
                leaf = _get_path(sub, path)
                if leaf is None:
                    continue
                sd[prefix + tbase] = _INVERSE_FULL[kind](np.asarray(leaf))
                continue
            node = _get_path(sub, path)
            if node is None or "kernel" not in node:
                continue
            sd[prefix + tbase + ".weight"] = _INVERSE_WEIGHT[kind](
                np.asarray(node["kernel"]))
            if "bias" in node:
                sd[prefix + tbase + ".bias"] = np.asarray(node["bias"])
    return sd


def _read_torch_file(path: str) -> Dict[str, np.ndarray]:
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in raw.items()
            if hasattr(v, "detach")}


def load_pretrained(
    params: Dict[str, Any],
    path: str,
    include: Optional[str] = None,
    exclude: Optional[str] = None,
    rename_map: Optional[Dict[str, str]] = None,
    num_layers: int = 4,
) -> Dict[str, Any]:
    """Load a torch checkpoint file into the full flax param tree.

    Regex include/exclude filters and the literal rename map mirror the
    reference's pretrained loader (`tools/eval.py:386-413`,
    `utils/util.py modify_parameter_name_with_map`). Full-model `.tckpt`
    checkpoints (keys carrying `hybrid_desc_net.`/`motion_net.`/... prefixes)
    route through `load_full_checkpoint`; bare sub-network files
    (`superpoint_v1.pth`, `img_fea_enc.pth`, `gru_update.pth`) route to
    their owning subtree directly.
    """
    sd = _read_torch_file(path)
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

    prefixes = tuple(pfx for pfx, _, _ in full_model_routes(num_layers))
    if any(k.startswith(prefixes) for k in sd):
        out, _, _ = load_full_checkpoint(params, sd, num_layers)
        return out

    import copy

    out = copy.deepcopy(params)
    p = out["params"] if "params" in out else out

    routes = [
        (SUPERPOINT_MAP, ("hybrid", "desc2d")),
        (RAFT_ENCODER_MAP, ("motion", "image_fea_enc")),
        (RAFT_UPDATE_MAP, ("motion", "inner", "cf_step")),
    ]
    # A key is unmatched only if *every* route skipped it.
    unmatched = {k for k in sd if not _is_ignored(k)}
    for name_map, root in routes:
        sub = _get_path(p, root)
        if sub is None:
            continue
        new_sub, skipped = torch_to_flax(sd, name_map, sub)
        node = _get_path(p, root[:-1])
        node[root[-1]] = new_sub
        unmatched &= set(skipped)
    if unmatched:
        print(f"load_pretrained: {len(unmatched)} torch keys unmatched")
    return out
