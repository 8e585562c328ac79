"""Weight-transfer parity: reference torch Unet1D vs our Flax Unet1D.

Initialises the reference denoiser, copies its weights into the Flax
parameter tree, and checks the forward outputs match.  This validates every
wiring detail (skip order, attention math, norm placement, upsample length
fix) rather than just shapes.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from handpose_tpu.nn.diffusion import Unet1D

sys.path.insert(0, "/root/reference")


def _conv(w):
    return jnp.asarray(w.detach().numpy().transpose(2, 1, 0))


def _lin(w):
    return jnp.asarray(w.detach().numpy().T)


def _vec(w):
    return jnp.asarray(w.detach().numpy())


def _block(tb, fl):
    """torch Block -> flax Block params."""
    fl["proj"] = {"kernel": _conv(tb.proj.weight), "bias": _vec(tb.proj.bias)}
    fl["norm"] = {"scale": _vec(tb.norm.weight), "bias": _vec(tb.norm.bias)}


def _resblock(trb, out):
    out["block1"] = {}
    _block(trb.block1, out["block1"])
    out["block2"] = {}
    _block(trb.block2, out["block2"])
    out["time_proj"] = {"kernel": _lin(trb.mlp[1].weight),
                        "bias": _vec(trb.mlp[1].bias)}
    if not isinstance(trb.res_conv, torch.nn.Identity):
        out["res_conv"] = {"kernel": _conv(trb.res_conv.weight),
                           "bias": _vec(trb.res_conv.bias)}


def _lin_attn(tres, out, cls_name):
    """torch Residual(PreNorm(LinearAttention/Attention)) -> PreNormResidual."""
    prenorm = tres.fn
    attn = prenorm.fn
    out["norm"] = {"g": jnp.asarray(
        prenorm.norm.g.detach().numpy().transpose(0, 2, 1))}
    a = {"to_qkv": {"kernel": _conv(attn.to_qkv.weight)}}
    if isinstance(attn.to_out, torch.nn.Sequential):   # LinearAttention
        a["to_out"] = {"kernel": _conv(attn.to_out[0].weight),
                       "bias": _vec(attn.to_out[0].bias)}
        a["out_norm"] = {"g": jnp.asarray(
            attn.to_out[1].g.detach().numpy().transpose(0, 2, 1))}
    else:
        a["to_out"] = {"kernel": _conv(attn.to_out.weight),
                       "bias": _vec(attn.to_out.bias)}
    out[cls_name] = a


def build_unet_params(tnet):
    """Map a reference torch Unet1D's weights to our flax Unet1D tree."""
    p = {}
    p["init_conv"] = {"kernel": _conv(tnet.init_conv.weight),
                      "bias": _vec(tnet.init_conv.bias)}
    p["time_mlp_1"] = {"kernel": _lin(tnet.time_mlp[1].weight),
                       "bias": _vec(tnet.time_mlp[1].bias)}
    p["time_mlp_2"] = {"kernel": _lin(tnet.time_mlp[3].weight),
                       "bias": _vec(tnet.time_mlp[3].bias)}
    p["cond_mlp_1"] = {"kernel": _lin(tnet.condition_feat_mlp[0].weight),
                       "bias": _vec(tnet.condition_feat_mlp[0].bias)}
    p["cond_mlp_2"] = {"kernel": _lin(tnet.condition_feat_mlp[2].weight),
                       "bias": _vec(tnet.condition_feat_mlp[2].bias)}

    n_stages = len(tnet.downs)
    for i, (b1, b2, attn, down) in enumerate(tnet.downs):
        p[f"down_{i}_block1"] = {}
        _resblock(b1, p[f"down_{i}_block1"])
        p[f"down_{i}_block2"] = {}
        _resblock(b2, p[f"down_{i}_block2"])
        p[f"down_{i}_attn"] = {}
        _lin_attn(attn, p[f"down_{i}_attn"], "attn")
        name = (f"down_{i}_downsample" if i < n_stages - 1
                else f"down_{i}_conv")
        p[name] = {"kernel": _conv(down.weight), "bias": _vec(down.bias)}

    p["mid_block1"] = {}
    _resblock(tnet.mid_block1, p["mid_block1"])
    p["mid_attn"] = {}
    _lin_attn(tnet.mid_attn, p["mid_attn"], "attn")
    p["mid_block2"] = {}
    _resblock(tnet.mid_block2, p["mid_block2"])

    for i, (b1, b2, attn, up) in enumerate(tnet.ups):
        p[f"up_{i}_block1"] = {}
        _resblock(b1, p[f"up_{i}_block1"])
        p[f"up_{i}_block2"] = {}
        _resblock(b2, p[f"up_{i}_block2"])
        p[f"up_{i}_attn"] = {}
        _lin_attn(attn, p[f"up_{i}_attn"], "attn")
        if i < n_stages - 1:   # CustomUpsample
            p[f"up_{i}_upsample_conv"] = {"kernel": _conv(up.conv.weight),
                                          "bias": _vec(up.conv.bias)}
        else:
            p[f"up_{i}_conv"] = {"kernel": _conv(up.weight),
                                 "bias": _vec(up.bias)}

    p["final_res_block"] = {}
    _resblock(tnet.final_res_block, p["final_res_block"])
    p["final_conv"] = {"kernel": _conv(tnet.final_conv.weight),
                       "bias": _vec(tnet.final_conv.bias)}
    return p


def test_unet1d_forward_parity():
    from network.sub_modules.conditionalDiffusion import Unet1D as TorchUnet1D

    torch.manual_seed(0)
    dim, cond_dim = 32, 48
    tnet = TorchUnet1D(dim=dim, dim_mults=(1, 2, 4, 8), channels=1,
                       condition_feat_dim=cond_dim).eval()

    fnet = Unet1D(dim=dim, dim_mults=(1, 2, 4, 8), channels=1,
                  condition_feat_dim=cond_dim)

    p = build_unet_params(tnet)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 1, 63)).astype(np.float32)       # torch layout
    t = np.array([3, 250], np.int64)
    cond = rng.normal(size=(2, cond_dim)).astype(np.float32)

    with torch.no_grad():
        ref = tnet(torch.tensor(x), torch.tensor(t),
                   condition=torch.tensor(cond)).numpy()

    ours = fnet.apply({"params": p}, jnp.asarray(x.transpose(0, 2, 1)),
                      jnp.asarray(t), jnp.asarray(cond))
    ours = np.asarray(ours).transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref, atol=2e-4)
