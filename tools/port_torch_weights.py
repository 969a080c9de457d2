"""Port torch checkpoints into the flax parameter tree.

The reference initializes its 2D backbone from the COTR checkpoint
(reference: nerf_loc/models/COTR/backbone2d.py:143-158, torchvision ResNet50
state-dict names). This module maps that naming onto
nerfloc_tpu.models.backbone.Backbone2D's variables:

  conv weights: torch OIHW -> flax HWIO
  BatchNorm: weight/bias/running_mean/running_var -> the 'frozen' collection
  Dense: torch [out, in] -> flax [in, out]

Usage:
  from tools.port_torch_weights import port_resnet50_trunk
  variables = port_resnet50_trunk(state_dict_numpy, variables)
where state_dict_numpy maps torchvision names to numpy arrays (load a torch
checkpoint with torch.load(...) and call .numpy() per tensor).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _bn(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "weight": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
        "running_mean": sd[f"{prefix}.running_mean"],
        "running_var": sd[f"{prefix}.running_var"],
    }


def resnet50_trunk_maps(sd: Dict[str, np.ndarray]):
    """(params, frozen) flax subtrees for models.backbone.ResNet50Trunk from
    a torchvision-style resnet50 state dict (conv1..layer2 only — all the
    reference uses, backbone2d.py return_layers)."""
    params: Dict = {"conv1": {"kernel": _conv(sd["conv1.weight"])}}
    frozen: Dict = {"bn1": _bn(sd, "bn1")}
    blocks = {"layer1": 3, "layer2": 4}
    for layer, n in blocks.items():
        for i in range(n):
            t = f"{layer}.{i}"
            f = f"{layer}_{i}"
            params[f] = {
                "conv1": {"kernel": _conv(sd[f"{t}.conv1.weight"])},
                "conv2": {"kernel": _conv(sd[f"{t}.conv2.weight"])},
                "conv3": {"kernel": _conv(sd[f"{t}.conv3.weight"])},
            }
            frozen[f] = {
                "bn1": _bn(sd, f"{t}.bn1"),
                "bn2": _bn(sd, f"{t}.bn2"),
                "bn3": _bn(sd, f"{t}.bn3"),
            }
            if f"{t}.downsample.0.weight" in sd:
                params[f]["downsample_conv"] = {
                    "kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                frozen[f]["downsample_bn"] = _bn(sd, f"{t}.downsample.1")
    return params, frozen


def fpn_maps(sd: Dict[str, np.ndarray], names=("layer1", "layer2"),
             prefix: str = "fpn.") -> Dict:
    """flax params subtree for models.backbone.FPN from torchvision
    FeaturePyramidNetwork names (reference COTR/fpn.py:181-193;
    Conv2dNormActivation puts the conv at index 0 and the param-free
    InstanceNorm at index 1). Accepts both the v2 ('inner_blocks.i.0.weight')
    and pre-v2 ('inner_blocks.i.weight') torchvision layouts."""
    params: Dict = {}
    for i, n in enumerate(names):
        for block, ours in (("inner_blocks", f"inner_{n}"),
                            ("layer_blocks", f"layer_{n}")):
            for key in (f"{prefix}{block}.{i}.0.weight",
                        f"{prefix}{block}.{i}.weight"):
                if key in sd:
                    params[ours] = {"kernel": _conv(sd[key])}
                    break
            else:
                raise KeyError(f"no FPN weight for {block}[{i}] under {prefix}")
    return params


def port_cotr_checkpoint(model_state_dict: Dict[str, np.ndarray], variables,
                         backbone_path=("backbone2d",)):
    """Initialize the full Backbone2D (trunk + FPN when present) from a COTR
    checkpoint's model_state_dict (reference backbone2d.py:143-158: keys
    filtered to 'backbone', 'backbone.0.' stripped, loaded strict=False —
    FPN weights may be absent, in which case the random init is kept)."""
    sd = {k.replace("backbone.0.", ""): v
          for k, v in model_state_dict.items() if "backbone" in k}
    trunk_sd = {k.replace("body.", "", 1): v
                for k, v in sd.items() if k.startswith("body.")}
    variables = port_resnet50_trunk(trunk_sd, variables,
                                    trunk_path=backbone_path + ("trunk",))
    if any(k.startswith("fpn.") for k in sd):
        fpn = fpn_maps(sd)
        variables["params"] = _replace_subtree(
            _to_mutable(variables["params"]), backbone_path + ("fpn",), fpn)
    return variables


def _replace_subtree(tree, path, sub):
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = _merge_subtree_checked(node[path[-1]], sub)
    return tree


def _merge_subtree_checked(dst, src):
    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, dict):
            out[k] = _merge_subtree_checked(dst[k], v)
        else:
            assert np.shape(dst[k]) == np.shape(v), \
                f"shape mismatch at {k}: {np.shape(dst[k])} vs {np.shape(v)}"
            out[k] = np.asarray(v, dtype=np.float32)
    return out


def port_resnet50_trunk(sd: Dict[str, np.ndarray], variables,
                        trunk_path=("backbone2d", "trunk")):
    """Return a copy of `variables` with the trunk weights replaced.

    variables: flax variable dict with 'params' and 'frozen' collections.
    """
    import jax

    params, frozen = resnet50_trunk_maps(sd)

    def replace(tree, path, sub):
        node = tree
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = _merge_checked(node[path[-1]], sub)
        return tree

    def _merge_checked(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict):
                out[k] = _merge_checked(dst[k], v)
            else:
                assert np.shape(dst[k]) == np.shape(v), \
                    f"shape mismatch at {k}: {np.shape(dst[k])} vs {np.shape(v)}"
                out[k] = np.asarray(v, dtype=np.float32)
        return out

    variables = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    variables = dict(variables)
    variables["params"] = replace(_to_mutable(variables["params"]),
                                  trunk_path, params)
    variables["frozen"] = replace(_to_mutable(variables["frozen"]),
                                  trunk_path, frozen)
    return variables


def _to_mutable(tree):
    if hasattr(tree, "unfreeze"):
        tree = tree.unfreeze()
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree
