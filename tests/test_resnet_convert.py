"""Weight-converter numerics: torch ResNet forward == converted Flax forward.

torchvision is unavailable here, so the test defines a minimal torch
ResNet with torchvision's exact module/state-dict naming (conv1, bn1,
layerX.Y.convZ/bnZ/downsample) -- the same structure the reference
hand-rolls in resnetMANO.py -- and checks our converted Flax trunk
reproduces its eval-mode forward.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax.numpy as jnp

from handpose_tpu.nn.resnet import ResNet, BasicBlock, BottleneckBlock

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_torch_resnet import convert_state_dict  # noqa: E402


from torchvision_shim import (TorchBasic, TorchBottleneck,  # noqa: E402
                              TorchResNet)


@pytest.mark.parametrize("block,layers,fblock,name", [
    (TorchBasic, [2, 2, 2, 2], BasicBlock, "basic"),
    (TorchBottleneck, [2, 2, 2, 2], BottleneckBlock, "bottleneck"),
])
def test_converted_forward_matches_torch(block, layers, fblock, name):
    torch.manual_seed(0)
    tnet = TorchResNet(block, layers, num_classes=40).eval()
    # randomise BN stats so the test catches mean/var mapping errors
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params, stats = convert_state_dict(sd, layers, block=name,
                                       skip_stem=False)

    fnet = ResNet(stage_sizes=layers, block_cls=fblock, num_classes=40,
                  stem="k7s2")
    x = np.random.default_rng(0).normal(
        size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours = fnet.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4)


def _shim_state_dict(layers=(2, 2, 2, 2)):
    torch.manual_seed(1)
    tnet = TorchResNet(TorchBottleneck, list(layers), num_classes=8).eval()
    return {k: v.numpy() for k, v in tnet.state_dict().items()}


def test_contract_verifier_rejects_violations():
    """verify_state_dict_contracts fails loudly on every class of
    malformed input that would otherwise convert garbage (torchvision
    itself is absent here -- these contracts ARE the converter's
    evidence that a real resnet50(pretrained=True) dict either converts
    correctly or refuses; see PARITY.md)."""
    from convert_torch_resnet import verify_state_dict_contracts

    def expect(msg_part, mutate, layers=(2, 2, 2, 2)):
        sd = _shim_state_dict()          # always a (2,2,2,2) dict
        mutate(sd)
        with pytest.raises(ValueError, match=msg_part):
            verify_state_dict_contracts(sd, list(layers), "bottleneck",
                                        skip_stem=False)

    # the clean shim dict passes
    verify_state_dict_contracts(_shim_state_dict(), [2, 2, 2, 2],
                                "bottleneck", skip_stem=False)

    # a dict already transposed to flax HWIO order must be rejected
    expect("kernel", lambda sd: sd.update(
        {"layer1.0.conv2.weight":
         sd["layer1.0.conv2.weight"].transpose(2, 3, 1, 0)}))
    # missing key (stage_sizes ask for more blocks than the dict holds)
    expect("missing key", lambda sd: None, layers=(3, 4, 6, 3))
    # leftover keys (stage_sizes ask for fewer blocks than the dict holds)
    expect("unconsumed", lambda sd: None, layers=(2, 1, 2, 2))
    # negative running variance is not a valid BN state
    expect("running_var", lambda sd: sd["layer2.0.bn1.running_var"]
           .__setitem__(0, -1.0))
    # BN vector length must equal the conv's out-channels
    expect("out-channels", lambda sd: sd.update(
        {"layer1.0.bn1.weight": sd["layer1.0.bn1.weight"][:-1]}))
    # wrong block class for the dict
    sd = _shim_state_dict()
    with pytest.raises(ValueError):
        verify_state_dict_contracts(sd, [2, 2, 2, 2], "basic",
                                    skip_stem=False)
    # int dtype (e.g. a num_batches_tracked mis-mapped into a slot)
    expect("not float", lambda sd: sd.update(
        {"layer1.0.conv1.weight":
         sd["layer1.0.conv1.weight"].astype(np.int32)}))


def test_s2d_stem_exact_equivalence():
    """'k3s2_s2d' computes the SAME function as the 'k3s2' stem with
    identical parameters (same param path conv_init/kernel) -- it is a
    pure MXU-layout optimisation (space-to-depth widens the contraction
    4x), not a semantic change."""
    import jax

    from handpose_tpu.nn.resnet import ResNet, BasicBlock

    x = np.random.default_rng(1).normal(
        size=(2, 64, 64, 21)).astype(np.float32)
    base = ResNet(stage_sizes=[2, 2, 2, 2], block_cls=BasicBlock,
                  num_classes=16, stem="k3s2")
    s2d = ResNet(stage_sizes=[2, 2, 2, 2], block_cls=BasicBlock,
                 num_classes=16, stem="k3s2_s2d")
    variables = base.init(jax.random.PRNGKey(0), jnp.asarray(x))
    a = base.apply(variables, jnp.asarray(x), train=False)
    b = s2d.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=1e-5)

    # gradient path works too (training with the fast stem)
    g = jax.grad(lambda v: float(0) + jnp.sum(
        s2d.apply(v, jnp.asarray(x), train=False)))(variables)
    k = g["params"]["conv_init"]["kernel"]
    assert np.isfinite(np.asarray(k)).all() and float(
        jnp.sum(jnp.abs(k))) > 0
