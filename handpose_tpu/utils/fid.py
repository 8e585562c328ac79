"""Frechet distance (FID) evaluation for the image-diffusion demo.

Counterpart of the reference scratchpad's Keras-InceptionV3 FID
(reference example/diffusionExample.py:293-370): two sample sets ->
feature activations -> Frechet distance between their Gaussian fits

    FID = |mu1 - mu2|^2 + tr(S1 + S2 - 2 sqrtm(S1 @ S2)).

The Frechet math is the reference's exactly (including the real-part
correction for numerical imaginary components).  The feature extractor
is pluggable: the reference uses ImageNet-pretrained InceptionV3
(``include_top=False, pooling='avg'``), whose weights cannot be obtained
in this environment (no egress, no torchvision/keras weights).  The
default here is a FIXED, seeded random-convolution network with global
average pooling -- a documented PROXY: random-feature Frechet distances
preserve the metric's structure (0 for identical distributions,
monotone in distributional distance) and are reproducible across runs,
but the absolute numbers are NOT comparable to InceptionV3 FID scores.
When a genuine feature extractor is available, pass it as ``features``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def frechet_distance(act1: np.ndarray, act2: np.ndarray) -> float:
    """Frechet distance between Gaussian fits of two activation sets.

    act1/act2: (N, D) feature activations.  Mirrors reference
    diffusionExample.py:307-323 (numpy mean/cov + scipy sqrtm + real-part
    correction).
    """
    from scipy.linalg import sqrtm

    act1 = np.asarray(act1, np.float64)
    act2 = np.asarray(act2, np.float64)
    mu1, sigma1 = act1.mean(axis=0), np.cov(act1, rowvar=False)
    mu2, sigma2 = act2.mean(axis=0), np.cov(act2, rowvar=False)
    ssdiff = float(np.sum((mu1 - mu2) ** 2.0))
    covmean = sqrtm(sigma1.dot(sigma2))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(ssdiff + np.trace(sigma1 + sigma2 - 2.0 * covmean))


def random_conv_features(images: np.ndarray, feature_dim: int = 64,
                         seed: int = 0) -> np.ndarray:
    """Fixed random 3-layer conv net + global average pool (the
    InceptionV3 proxy; see module docstring).

    images: (N, H, W, C) floats in any consistent range.
    Returns (N, feature_dim) float32 activations.
    """
    x = jnp.asarray(images, jnp.float32)
    key = jax.random.PRNGKey(seed)
    widths = (32, 64, feature_dim)
    c_in = x.shape[-1]
    for i, w in enumerate(widths):
        key, sub = jax.random.split(key)
        k = jax.random.normal(sub, (3, 3, c_in, w)) * np.sqrt(
            2.0 / (9 * c_in))
        x = jax.lax.conv_general_dilated(
            x, k, window_strides=(2, 2) if i > 0 else (1, 1),
            padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x)
        c_in = w
    return np.asarray(jnp.mean(x, axis=(1, 2)))


def fid_score(images1: np.ndarray, images2: np.ndarray,
              features=None) -> float:
    """FID between two image sets.  ``features``: (N,H,W,C) -> (N,D)
    extractor; defaults to the seeded random-conv proxy."""
    features = features or random_conv_features
    return frechet_distance(features(np.asarray(images1)),
                            features(np.asarray(images2)))
