"""MatConvNet -> Flax NetVLAD weight loader.

Port of the reference's MATLAB checkpoint parsing (reference:
nerf_loc/models/image_retrieval/netvlad.py:45-157, which loads hloc's
`*_struct.mat` exports — VGG16 conv stack, VLAD soft-assignment + centers,
PCA whitening, and the 0-255 average-image preprocessing). The checkpoint
itself must be downloaded out of band (zero egress here); this module turns
it into a `(NetVLAD module, flax params)` pair.

Layout notes vs the torch port:
  * conv kernels: MatConvNet stores S x S x IN x OUT — exactly flax's HWIO,
    no permute (torch needed OIHW, netvlad.py:96-100).
  * centers: stored negated, D x K (netvlad.py:105-107) -> ours [K, D].
  * whitening: the reference flattens VLAD as [D, K] (C-major,
    netvlad.py:40); ours flattens [K, D]. The whitening rows are permuted
    here so the module keeps its natural layout.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def _classify_layers(layers):
    """Split weighted layers into (vgg convs, vlad, whitening) by weight
    shape: VGG convs are SxSxINxOUT with S>1, the VLAD layer carries two 2-D
    [D, K] arrays (score proj + negated centers, netvlad.py:103-107), the
    whitening is a 1x1 'conv' (netvlad.py:117-120)."""
    vgg, vlad, whiten = [], None, None
    for layer in layers:
        w = getattr(layer, "weights", None)
        if w is None or (isinstance(w, np.ndarray) and w.dtype != object
                         and w.size == 0):
            continue
        if len(w) < 1:
            continue
        w0 = np.asarray(w[0])
        w1 = np.asarray(w[1]) if len(w) >= 2 else None
        if w0.ndim == 4 and w0.shape[0] > 1:
            vgg.append(layer)
        elif w0.ndim == 4 and w0.shape[0] == 1 and w0.shape[1] == 1:
            whiten = layer
        elif w0.ndim == 2 and w1 is not None and w1.ndim == 2:
            vlad = layer
        elif w0.ndim == 2 and w1 is not None and w1.ndim <= 1:
            # loadmat(squeeze_me=True) collapses the 1x1xINxOUT whitening
            # kernel to [IN, OUT]; its bias stays 1-D (vs VLAD's 2-D centers)
            whiten = layer
    return vgg, vlad, whiten


def load_matconvnet_netvlad(path: str, whiten: bool = True):
    """Parse an hloc `*_struct.mat` NetVLAD checkpoint.

    Returns (module, {"params": ...}) ready for `module.apply`.
    """
    from scipy.io import loadmat

    from .netvlad import NetVLAD

    mat = loadmat(path, struct_as_record=False, squeeze_me=True)
    layers = list(mat["net"].layers)

    vgg, vlad_layer, whiten_layer = _classify_layers(layers)
    if len(vgg) != 13 or vlad_layer is None:
        raise ValueError(
            f"unexpected checkpoint structure: {len(vgg)} conv layers, "
            f"vlad={'yes' if vlad_layer is not None else 'no'}")

    params = {"backbone": {}}
    for i, layer in enumerate(vgg):
        w = np.asarray(layer.weights[0], dtype=np.float32)  # S,S,IN,OUT = HWIO
        b = np.asarray(layer.weights[1], dtype=np.float32).reshape(-1)
        params["backbone"][f"conv{i}"] = {"kernel": w, "bias": b}

    score_w = np.asarray(vlad_layer.weights[0], dtype=np.float32)   # D,K
    centers = -np.asarray(vlad_layer.weights[1], dtype=np.float32)  # D,K (negated)
    D, K = score_w.shape
    params["assign"] = {"kernel": score_w, "bias": np.zeros(K, np.float32)}
    params["centers"] = centers.T  # [K, D]

    out_dim = 4096
    if whiten:
        if whiten_layer is None:
            raise ValueError("whiten=True but no 1x1 whitening layer in .mat")
        w = np.asarray(whiten_layer.weights[0], dtype=np.float32).reshape(D * K, -1)
        b = np.asarray(whiten_layer.weights[1], dtype=np.float32).reshape(-1)
        out_dim = w.shape[1]
        # reference VLAD flattening index = d*K + k; ours = k*D + d
        ref_rows = (np.arange(K)[:, None] + np.arange(D)[None, :] * K).reshape(-1)
        params["whiten"] = {"kernel": w[ref_rows], "bias": b}

    avg = np.asarray(mat["net"].meta.normalization.averageImage,
                     dtype=np.float32).reshape(-1)
    if avg.size == 1:
        avg = np.repeat(avg, 3)

    # reconstruct the width config from the kernels (pool markers are at
    # the VGG16 block boundaries: after convs 2, 4, 7, 10)
    widths = [p["kernel"].shape[-1] for p in
              (params["backbone"][f"conv{i}"] for i in range(13))]
    vgg_cfg = []
    for i, wdt in enumerate(widths):
        vgg_cfg.append(wdt)
        if i + 1 in (2, 4, 7, 10):
            vgg_cfg.append("M")

    module = NetVLAD(num_clusters=K, out_dim=out_dim, whiten=whiten,
                     input_scale=255.0, pixel_mean=tuple(avg.tolist()),
                     vgg_cfg=tuple(vgg_cfg))
    import jax

    params = jax.tree.map(lambda x: np.asarray(x), params)
    return module, {"params": params}
