"""dirtorch -> Flax AP-GeM weight loader + PCA whitening.

Port of the reference's DIR checkpoint handling (reference:
nerf_loc/models/image_retrieval/dir.py:34-88): a dirtorch checkpoint is a
torch pickle holding `state_dict` (torchvision-style ResNet names at the
top level plus `adpool.p` for the GeM exponent and `fc.{weight,bias}` for
the projection), optional `pca` (dict of fitted sklearn PCA objects keyed
by whitening dataset, e.g. 'Landmarks_clean'), and optional preprocessing
meta (mean/std the reference reads as net.preprocess, dir.py:73-77).

This module turns that into `(GeMDescriptor, flax variables, pca)` and
implements the whitening post-process the reference applies on host numpy
(dir.py:80-84, dirtorch common.whiten_features semantics).

Layout notes: conv kernels OIHW -> HWIO; BatchNorm statistics land in the
'frozen' collection (see models/backbone.FrozenBatchNorm); torch Linear
[out, in] -> flax Dense [in, out].
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _bn(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"weight": sd[f"{prefix}.weight"],
            "bias": sd[f"{prefix}.bias"],
            "running_mean": sd[f"{prefix}.running_mean"],
            "running_var": sd[f"{prefix}.running_var"]}


def infer_blocks(sd: Dict[str, np.ndarray]) -> Tuple[int, ...]:
    """Bottleneck counts per layer from the state-dict key space (resnet50
    (3,4,6,3) vs resnet101 (3,4,23,3) — dir.py:36 ships the latter)."""
    blocks = []
    for li in range(1, 5):
        n = 0
        while f"layer{li}.{n}.conv1.weight" in sd:
            n += 1
        if n == 0:
            raise KeyError(f"state dict has no layer{li} bottlenecks")
        blocks.append(n)
    return tuple(blocks)


def full_trunk_maps(sd: Dict[str, np.ndarray], blocks: Tuple[int, ...]):
    """(params, frozen) subtrees for retrieval.gem.FullResNetTrunk from a
    torchvision-style resnet state dict (conv1..layer4 — superset of
    tools/port_torch_weights.resnet50_trunk_maps, which stops at layer2)."""
    params: Dict = {"conv1": {"kernel": _conv(sd["conv1.weight"])}}
    frozen: Dict = {"bn1": _bn(sd, "bn1")}
    for li, n in enumerate(blocks, start=1):
        for i in range(n):
            t = f"layer{li}.{i}"
            f = f"layer{li}_{i}"
            params[f] = {
                "conv1": {"kernel": _conv(sd[f"{t}.conv1.weight"])},
                "conv2": {"kernel": _conv(sd[f"{t}.conv2.weight"])},
                "conv3": {"kernel": _conv(sd[f"{t}.conv3.weight"])},
            }
            frozen[f] = {"bn1": _bn(sd, f"{t}.bn1"),
                         "bn2": _bn(sd, f"{t}.bn2"),
                         "bn3": _bn(sd, f"{t}.bn3")}
            if f"{t}.downsample.0.weight" in sd:
                params[f]["downsample_conv"] = {
                    "kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                frozen[f]["downsample_bn"] = _bn(sd, f"{t}.downsample.1")
    return params, frozen


def port_dirtorch_gem(sd: Dict[str, np.ndarray]):
    """numpy state dict -> (GeMDescriptor, {'params', 'frozen'} variables).

    Expects dirtorch ResNet_RMAC naming: trunk keys at top level,
    `adpool.p` (GeM exponent) and `fc.{weight,bias}` (projection). Missing
    adpool.p falls back to the reference conf's gemp=3 (dir.py:45).
    """
    from .gem import GeMDescriptor

    blocks = infer_blocks(sd)
    trunk_params, trunk_frozen = full_trunk_maps(sd, blocks)
    fc_w = np.asarray(sd["fc.weight"], np.float32)          # [out, in]
    fc_b = np.asarray(sd["fc.bias"], np.float32)
    p = float(np.asarray(sd.get("adpool.p", 3.0)).reshape(()))
    params = {"trunk": trunk_params,
              "p": np.float32(p),
              "whiten": {"kernel": fc_w.T, "bias": fc_b}}
    module = GeMDescriptor(out_dim=fc_w.shape[0], p_init=p, blocks=blocks)
    return module, {"params": params, "frozen": {"trunk": trunk_frozen}}


def _to_numpy_sd(obj) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in obj.items():
        k = k[len("module."):] if k.startswith("module.") else k
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") \
            else np.asarray(v)
    return out


def load_dirtorch(path: str):
    """Load a dirtorch checkpoint file (e.g. Resnet-101-AP-GeM.pt).

    Returns (module, variables, pca) where pca is the checkpoint's dict of
    fitted sklearn PCA objects (or {} if absent) for whiten_features. The
    file is a torch pickle; old checkpoints reference
    sklearn.decomposition.pca, aliased here exactly as the reference does
    (dir.py:27-31).
    """
    import sys

    import torch

    try:  # sklearn >= 0.24 moved the module the old pickles reference
        import sklearn.decomposition as _dec
        sys.modules.setdefault("sklearn.decomposition.pca", _dec._pca)
    except Exception:
        pass
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    module, variables = port_dirtorch_gem(_to_numpy_sd(sd))
    pca = ckpt.get("pca", {}) if isinstance(ckpt, dict) else {}
    return module, variables, pca


def whiten_features(X: np.ndarray, pca, whitenp: float = 0.25,
                    whitenv: Optional[int] = None, whitenm: float = 1.0,
                    l2norm: bool = True) -> np.ndarray:
    """PCA-whiten descriptors (dirtorch common.whiten_features; the
    reference calls it with whitenp=0.25, whitenv=None, whitenm=1.0 —
    dir.py:38-43,80-84).

    X [N, D] -> centered, projected onto the first `whitenv` principal
    components, scaled by singular_values**-whitenp / whitenm, then
    L2-normalized.
    """
    D = X.shape[1] if whitenv is None else whitenv
    comp = np.asarray(pca.components_, np.float32)[:D]
    mean = np.asarray(pca.mean_, np.float32)
    sv = np.asarray(pca.singular_values_, np.float32)[:D]
    out = (X.astype(np.float32) - mean) @ comp.T
    out = out / (whitenm * np.power(sv, whitenp))
    if l2norm:
        out = out / (np.linalg.norm(out, axis=-1, keepdims=True) + 1e-12)
    return out
