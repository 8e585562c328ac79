"""Convert a torchvision-format ResNet state_dict to handpose_tpu params.

SURVEY.md §7.6: porting ImageNet-pretrained torchvision ResNet-18/50
weights is required for init parity with the reference (which constructs
``models.resnet50(pretrained=True)``, resNetFeatureExtractor.py:13).  This
environment has no torchvision and no egress, so the converter takes a
state_dict you bring (``torch.load('resnet50.pth')``) and emits the
params/batch_stats trees for :class:`handpose_tpu.nn.resnet.ResNet`.

The reference replaces conv1 anyway (k=3 s=2, new in-channels), so
``skip_stem=True`` (default) leaves the stem at its fresh initialisation
and ports layers1-4 + bn1?no: bn1 belongs to the stem too -- only
layer1..4 and fc are ported.

Usage:
    from tools.convert_torch_resnet import convert_state_dict
    params, batch_stats = convert_state_dict(sd, stage_sizes=[3,4,6,3],
                                             block="bottleneck")
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    """torch (out, in, kh, kw) -> flax (kh, kw, in, out)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _set(tree: dict, path: Tuple[str, ...], value) -> None:
    d = tree
    for k in path[:-1]:
        d = d.setdefault(k, {})
    d[path[-1]] = np.asarray(value)


def convert_state_dict(sd: Dict[str, np.ndarray], stage_sizes,
                       block: str = "bottleneck",
                       skip_stem: bool = True):
    """Returns (params, batch_stats) nested dicts for nn.resnet.ResNet.

    Args:
      sd: torchvision-format state dict (tensors or ndarrays).
      stage_sizes: e.g. [2,2,2,2] (resnet18) / [3,4,6,3] (resnet50).
      block: 'basic' | 'bottleneck' -- selects the flax block class name.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}
    cls = "BasicBlock" if block == "basic" else "BottleneckBlock"
    n_convs = 2 if block == "basic" else 3

    if not skip_stem:
        _set(params, ("conv_init", "kernel"), _conv(sd["conv1.weight"]))
        _set(params, ("bn_init", "scale"), sd["bn1.weight"])
        _set(params, ("bn_init", "bias"), sd["bn1.bias"])
        _set(stats, ("bn_init", "mean"), sd["bn1.running_mean"])
        _set(stats, ("bn_init", "var"), sd["bn1.running_var"])

    block_idx = 0
    for stage, n_blocks in enumerate(stage_sizes):
        for b in range(n_blocks):
            t = f"layer{stage + 1}.{b}"
            f = f"{cls}_{block_idx}"
            for c in range(n_convs):
                _set(params, (f, f"Conv_{c}", "kernel"),
                     _conv(sd[f"{t}.conv{c + 1}.weight"]))
                _set(params, (f, f"BatchNorm_{c}", "scale"),
                     sd[f"{t}.bn{c + 1}.weight"])
                _set(params, (f, f"BatchNorm_{c}", "bias"),
                     sd[f"{t}.bn{c + 1}.bias"])
                _set(stats, (f, f"BatchNorm_{c}", "mean"),
                     sd[f"{t}.bn{c + 1}.running_mean"])
                _set(stats, (f, f"BatchNorm_{c}", "var"),
                     sd[f"{t}.bn{c + 1}.running_var"])
            if f"{t}.downsample.0.weight" in sd:
                _set(params, (f, "conv_proj", "kernel"),
                     _conv(sd[f"{t}.downsample.0.weight"]))
                _set(params, (f, "norm_proj", "scale"),
                     sd[f"{t}.downsample.1.weight"])
                _set(params, (f, "norm_proj", "bias"),
                     sd[f"{t}.downsample.1.bias"])
                _set(stats, (f, "norm_proj", "mean"),
                     sd[f"{t}.downsample.1.running_mean"])
                _set(stats, (f, "norm_proj", "var"),
                     sd[f"{t}.downsample.1.running_var"])
            block_idx += 1

    if "fc.weight" in sd:
        _set(params, ("fc", "kernel"), np.asarray(sd["fc.weight"]).T)
        _set(params, ("fc", "bias"), sd["fc.bias"])
    return params, stats


def merge_into(init_variables: dict, params: dict, batch_stats: dict,
               scope: Tuple[str, ...] = ()) -> dict:
    """Overlay converted trees onto freshly-initialised flax variables
    (e.g. under variables['params']['trunk'])."""
    import copy

    out = copy.deepcopy(jax_to_dict(init_variables))

    def overlay(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                overlay(dst.setdefault(k, {}), v)
            else:
                dst[k] = v

    dst_p = out["params"]
    dst_s = out.get("batch_stats", {})
    for k in scope:
        dst_p = dst_p[k]
        dst_s = dst_s.get(k, {})
    overlay(dst_p, params)
    overlay(dst_s, batch_stats)
    return out


def jax_to_dict(tree):
    if hasattr(tree, "unfreeze"):
        tree = tree.unfreeze()
    if isinstance(tree, dict):
        return {k: jax_to_dict(v) for k, v in tree.items()}
    return tree
