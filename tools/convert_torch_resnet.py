"""Convert a torchvision-format ResNet state_dict to handpose_tpu params.

SURVEY.md §7.6: porting ImageNet-pretrained torchvision ResNet-18/50
weights is required for init parity with the reference (which constructs
``models.resnet50(pretrained=True)``, resNetFeatureExtractor.py:13).  This
environment has no torchvision and no egress, so the converter takes a
state_dict you bring (``torch.load('resnet50.pth')``) and emits the
params/batch_stats trees for :class:`handpose_tpu.nn.resnet.ResNet`.

The reference replaces conv1 anyway (k=3 s=2, new in-channels), so
``skip_stem=True`` (default) leaves the stem (conv1 + bn1) at its fresh
initialisation and ports only layer1..4 and fc.

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


def verify_state_dict_contracts(sd: Dict[str, np.ndarray], stage_sizes,
                                block: str, skip_stem: bool) -> None:
    """Explicit structural contracts of a REAL torchvision state dict.

    This environment has no torchvision and no egress, so the converter
    has only ever been exercised against tests/torchvision_shim.py
    (documented in PARITY.md).  These checks pin everything about the
    torchvision format that the conversion RELIES on, so a genuine
    ``resnet50(pretrained=True).state_dict()`` that violates any
    assumption fails loudly here instead of converting garbage:

    * key coverage: every layerN.M.convK/bnK (+ downsample at each stage
      head, torchvision places it on block 0) present; no unconsumed
      layer keys left over (catches stage_sizes/block mismatches);
    * conv layout (out, in, kh, kw) with square odd kernels, 1x1/3x3
      (+7x7 stem), in-channels chaining conv-to-conv through the block
      (catches a state dict already transposed to flax order);
    * BN vectors 1-D, length == the conv's OUT channels (axis 0 of the
      torch conv -- the transpose contract), running_var >= 0;
    * bottleneck expansion 4 / basic expansion 1 across stages;
    * fc.weight (n_classes, C_final) matching the last stage's width;
    * float dtype on every tensor.
    """
    cls_expansion = 1 if block == "basic" else 4
    n_convs = 2 if block == "basic" else 3
    floats = (np.float32, np.float64, np.float16)

    def check(cond, msg):
        if not cond:
            raise ValueError(f"torchvision contract violated: {msg}")

    consumed = set()

    def get(key):
        check(key in sd, f"missing key {key!r}")
        consumed.add(key)
        t = sd[key]
        check(t.dtype.type in floats, f"{key}: dtype {t.dtype}, not float")
        return t

    def check_conv_bn(conv_key, bn_key, in_ch=None, kmax=3):
        w = get(conv_key)
        check(w.ndim == 4, f"{conv_key}: ndim {w.ndim}, want 4 "
                           "(out, in, kh, kw)")
        out_c, in_c, kh, kw = w.shape
        check(kh == kw and kh in (1, 3, 7) and kh <= kmax,
              f"{conv_key}: kernel {kh}x{kw} (a transposed/flax-order "
              "tensor puts channels here)")
        check(out_c >= in_c // 8 and in_c >= 3,
              f"{conv_key}: shape {w.shape} not (out, in, kh, kw)")
        if in_ch is not None:
            check(in_c == in_ch, f"{conv_key}: in-channels {in_c}, "
                                 f"expected {in_ch} from the chain")
        for suffix, pred in (("weight", None), ("bias", None),
                             ("running_mean", None),
                             ("running_var", lambda v: (v >= 0).all())):
            v = get(f"{bn_key}.{suffix}")
            check(v.ndim == 1 and v.shape[0] == out_c,
                  f"{bn_key}.{suffix}: shape {v.shape}, want ({out_c},) "
                  f"== out-channels of {conv_key}")
            if pred is not None:
                check(bool(pred(v)), f"{bn_key}.{suffix}: negative "
                                     "running_var")
        return out_c

    width = None
    if not skip_stem:
        # stem in-channels: 3 for stock torchvision; the reference swaps
        # conv1 to k3 s2 with 21/24 in-channels (resNetFeatureExtractor
        # .py:15-18, extendedResnet.py), converted through the same path
        width = check_conv_bn("conv1.weight", "bn1", kmax=7)
        check(sd["conv1.weight"].shape[1] in (3, 21, 24),
              f"conv1.weight: in-channels {sd['conv1.weight'].shape[1]} "
              "not one of (3, 21, 24)")
    for stage, n_blocks in enumerate(stage_sizes):
        for b in range(n_blocks):
            t = f"layer{stage + 1}.{b}"
            block_in = width
            mid = None
            for c in range(n_convs):
                mid = check_conv_bn(f"{t}.conv{c + 1}.weight",
                                    f"{t}.bn{c + 1}",
                                    in_ch=None if c == 0 else mid)
            has_ds = f"{t}.downsample.0.weight" in sd
            # torchvision: projection shortcut exactly on each stage's
            # block 0, except basic-block layer1 (stride 1, equal width)
            check(has_ds == (b == 0 and (stage > 0 or cls_expansion != 1)),
                  f"{t}: unexpected downsample layout")
            if has_ds:
                ds = check_conv_bn(f"{t}.downsample.0.weight",
                                   f"{t}.downsample.1", in_ch=block_in,
                                   kmax=1)
                check(ds == mid, f"{t}: downsample out {ds} != block "
                                 f"out {mid}")
            width = mid
        # expansion contract: stage output = base_width * 2^stage * exp
        base = 64 * (2 ** stage) * cls_expansion
        check(width == base,
              f"layer{stage + 1} out-channels {width}, expected {base} "
              f"for {block} blocks (wrong --block or stage_sizes?)")
    if "fc.weight" in sd:
        fcw = get("fc.weight")
        check(fcw.ndim == 2 and fcw.shape[1] == width,
              f"fc.weight: shape {fcw.shape}, want (n_classes, {width}) "
              "-- torch Linear layout (out, in)")
        b = get("fc.bias")
        check(b.shape == (fcw.shape[0],), "fc.bias/fc.weight mismatch")
    leftovers = {k for k in sd
                 if k.startswith("layer") and k not in consumed
                 and "num_batches_tracked" not in k}
    check(not leftovers,
          f"unconsumed layer keys (stage_sizes/block mismatch?): "
          f"{sorted(leftovers)[:6]}")


def convert_state_dict(sd: Dict[str, np.ndarray], stage_sizes,
                       block: str = "bottleneck",
                       skip_stem: bool = True, strict: bool = True):
    """Returns (params, batch_stats) nested dicts for nn.resnet.ResNet.

    Args:
      sd: torchvision-format state dict (tensors or ndarrays).
      stage_sizes: e.g. [2,2,2,2] (resnet18) / [3,4,6,3] (resnet50).
      block: 'basic' | 'bottleneck' -- selects the flax block class name.
      strict: verify the torchvision layout contracts first (see
        :func:`verify_state_dict_contracts`); disable only for
        deliberately partial dicts.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if strict:
        verify_state_dict_contracts(sd, stage_sizes, block, skip_stem)
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
