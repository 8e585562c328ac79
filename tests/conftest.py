"""Test configuration: CPU backend with 8 virtual devices.

Multi-device sharding tests run on a faked 8-device CPU mesh (the JAX-native
way to validate pjit/shard_map layouts without a TPU slice); numeric parity
tests run in float32 with `highest` matmul precision for determinism.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session env points at the TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# jax is already imported by the image's sitecustomize with JAX_PLATFORMS=axon
# captured from the env; override via the config API (effective until the
# backend is first initialised).
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pathlib

import numpy as np
import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def fixtures():
    def load(name):
        return dict(np.load(FIXTURES / f"{name}.npz"))
    return load


@pytest.fixture(autouse=True)
def _ref_config_restore():
    """Reference-config hygiene: the parity tests' _ref_config mutates
    the torch reference's module globals; snapshot/restore around every
    test so reference-executing tests cannot order-couple through leaked
    overrides (uv_from_xD, timesteps, the eypoint_num shim, ...)."""
    try:
        import config.config as refcfg
    except ImportError:
        yield
        return
    saved = {k: getattr(refcfg, k) for k in dir(refcfg)
             if not k.startswith("__")}
    yield
    for k, v in saved.items():
        setattr(refcfg, k, v)
    for k in [k for k in dir(refcfg)
              if not k.startswith("__") and k not in saved]:
        delattr(refcfg, k)
