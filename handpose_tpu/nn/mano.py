"""Batched differentiable MANO hand layer.

TPU-native redesign of reference network/sub_modules/MANOLayer.py:51-240:
linear blend skinning expressed as einsums, the 16-joint kintree accumulated
with static unrolling (the tree is a compile-time constant), Rodrigues with
a branch-free small-angle fallback, and the 5 fingertip mesh vertices
(333/444/672/555/745) appended to reach 21 joints.

The MANO_RIGHT.pkl asset (a licensed MPI file) is *not* bundled; the loader
reads it from an explicit path, ``$MANO_RIGHT_PKL``, or a small search list.
The original pickle embeds chumpy objects; a minimal stub unpickler converts
them to plain numpy without requiring the chumpy package.
"""

from __future__ import annotations

import os
import pickle
import sys
import types
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops.rotations import rodrigues

_SEARCH_PATHS = (
    "config/mano/models/MANO_RIGHT.pkl",
    "/root/reference/config/mano/models/MANO_RIGHT.pkl",
)


class _FakeCh:
    def __setstate__(self, state):
        self.__dict__.update(state if isinstance(state, dict) else {})

    def __array__(self, dtype=None):
        x = np.asarray(self.__dict__.get("x"))
        return x.astype(dtype) if dtype is not None else x


class _FakeSelect(_FakeCh):
    def __array__(self, dtype=None):
        a = np.asarray(self.__dict__["a"])
        x = a.ravel()[np.asarray(self.__dict__["idxs"])]
        shape = self.__dict__.get("preferred_shape")
        if shape is not None:
            x = x.reshape(shape)
        return x.astype(dtype) if dtype is not None else x


def _ensure_chumpy_stub():
    if "chumpy" in sys.modules:
        return
    pkg = types.ModuleType("chumpy")
    pkg.__path__ = []
    pkg.Ch = _FakeCh
    ch = types.ModuleType("chumpy.ch")
    ch.Ch = _FakeCh
    reo = types.ModuleType("chumpy.reordering")
    reo.Select = _FakeSelect
    sys.modules["chumpy"] = pkg
    sys.modules["chumpy.ch"] = ch
    sys.modules["chumpy.reordering"] = reo


def find_mano_pkl(path: str | None = None) -> str | None:
    candidates = []
    if path:
        candidates.append(path)
    if os.environ.get("MANO_RIGHT_PKL"):
        candidates.append(os.environ["MANO_RIGHT_PKL"])
    candidates.extend(_SEARCH_PATHS)
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


class ManoModel(NamedTuple):
    """Static MANO constants (numpy; promoted to jnp lazily)."""

    v_template: np.ndarray       # (778, 3)
    shapedirs: np.ndarray        # (778, 3, 10)
    posedirs: np.ndarray         # (778, 3, 135)
    J_regressor: np.ndarray      # (16, 778) densified
    weights: np.ndarray          # (778, 16)
    hands_components: np.ndarray  # (45, 45)
    hands_mean: np.ndarray       # (45,)
    parents: tuple               # len 16, parents[0] == -1
    faces: np.ndarray            # (1538, 3)


def load_mano(path: str | None = None) -> ManoModel:
    resolved = find_mano_pkl(path)
    if resolved is None:
        return synthetic_mano()
    _ensure_chumpy_stub()
    with open(resolved, "rb") as f:
        dd = pickle.load(f, encoding="latin1")
    kt = np.asarray(dd["kintree_table"])
    id_to_col = {int(kt[1, i]): i for i in range(kt.shape[1])}
    parents = [-1] + [id_to_col[int(kt[0, i])] for i in range(1, kt.shape[1])]
    jr = dd["J_regressor"]
    jr = np.asarray(jr.todense()) if hasattr(jr, "todense") else np.asarray(jr)
    return ManoModel(
        v_template=np.asarray(dd["v_template"], np.float32),
        shapedirs=np.asarray(dd["shapedirs"], np.float32),
        posedirs=np.asarray(dd["posedirs"], np.float32),
        J_regressor=jr.astype(np.float32),
        weights=np.asarray(dd["weights"], np.float32),
        hands_components=np.asarray(dd["hands_components"], np.float32),
        hands_mean=np.asarray(dd["hands_mean"], np.float32),
        parents=tuple(parents),
        faces=np.asarray(dd["f"], np.int32),
    )


def synthetic_mano(seed: int = 0) -> ManoModel:
    """Deterministic stand-in with MANO's exact shapes, for tests/CI
    environments without the licensed asset."""
    rng = np.random.default_rng(seed)
    V, J = 778, 16
    v_template = rng.normal(scale=0.03, size=(V, 3)).astype(np.float32)
    shapedirs = rng.normal(scale=0.01, size=(V, 3, 10)).astype(np.float32)
    posedirs = rng.normal(scale=0.001, size=(V, 3, 135)).astype(np.float32)
    # each joint regresses from a disjoint vertex bucket
    J_regressor = np.zeros((J, V), np.float32)
    for j in range(J):
        idx = rng.choice(V, size=10, replace=False)
        J_regressor[j, idx] = 0.1
    weights = rng.uniform(size=(V, J)).astype(np.float32)
    weights /= weights.sum(1, keepdims=True)
    hands_components = rng.normal(size=(45, 45)).astype(np.float32)
    hands_mean = rng.normal(scale=0.1, size=(45,)).astype(np.float32)
    parents = (-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14)
    faces = np.zeros((1538, 3), np.int32)
    return ManoModel(v_template, shapedirs, posedirs, J_regressor, weights,
                     hands_components, hands_mean, parents, faces)


# fingertip mesh vertices appended at joint slots 4/8/12/16/20
# (reference MANOLayer.py:196-200)
_TIP_VERTS = (333, 444, 672, 555, 745)
_TIP_SLOTS = (4, 8, 12, 16, 20)
_ROOT_ROT = np.array([np.pi, 0.0, 0.0], np.float32)


class ManoLayer:
    """Pure-function MANO forward (no trainable parameters).

    ``__call__(rots, poses, betas) -> (vertices (B,778,3), joints (B,21,3))``
    matching reference MANOLayer.py:122-240 numerically.
    """

    def __init__(self, model: ManoModel | None = None,
                 path: str | None = None, pose_num: int = 10,
                 bases_num: int = 10):
        m = model if model is not None else load_mano(path)
        self.pose_num = pose_num
        self.bases_num = bases_num
        self.parents = m.parents
        self.faces = m.faces
        self.v_template = jnp.asarray(m.v_template)
        # (bases, 778*3) like the reference's permute+reshape
        self.shape_basis = jnp.asarray(
            np.transpose(m.shapedirs, (2, 0, 1)).reshape(
                m.shapedirs.shape[-1], -1)[:bases_num])
        self.posedirs = jnp.asarray(m.posedirs)
        self.J_regressor = jnp.asarray(m.J_regressor)
        self.weights = jnp.asarray(m.weights)
        self.hands_components = jnp.asarray(
            np.vstack(m.hands_components[:pose_num]))
        self.hands_mean = jnp.asarray(m.hands_mean)

    def __call__(self, rots, poses, betas):
        return self.rot_pose_beta_to_mesh(rots, poses, betas)

    def rot_pose_beta_to_mesh(self, rots, poses, betas):
        """Args: rots (B,3) global axis-angle; poses (B,pose_num) PCA
        coefficients; betas (B,10) shape coefficients."""
        B = rots.shape[0]
        K = 16
        V = self.v_template.shape[0]

        # PCA pose -> 15 per-joint axis-angle rotations, root pinned to
        # [pi, 0, 0] (reference MANOLayer.py:126-128)
        full_pose = (self.hands_mean +
                     poses @ self.hands_components).reshape(B, K - 1, 3)
        root = jnp.broadcast_to(jnp.asarray(_ROOT_ROT), (B, 1, 3))
        pose = jnp.concatenate([root, full_pose], axis=1)       # (B, 16, 3)

        # shape blend: v_shaped = betas @ basis + template
        v_shaped = (betas @ self.shape_basis +
                    self.v_template.reshape(-1)).reshape(B, V, 3)

        # pose blend: (R(pose_j) - I) flattened over the 15 non-root joints
        pose_mats = rodrigues(pose[:, 1:, :].reshape(-1, 3)).reshape(
            B, K - 1, 3, 3)
        pose_feat = (pose_mats - jnp.eye(3)).reshape(B, -1)      # (B, 135)
        v_posed = v_shaped + jnp.einsum("vck,bk->bvc", self.posedirs,
                                        pose_feat)

        # rest-pose joints regressed from the *shaped* (not posed) mesh
        # (reference MANOLayer.py:139)
        J = jnp.einsum("jv,bvc->bjc", self.J_regressor, v_shaped)  # (B,16,3)

        # kintree accumulation: static unroll over the 16-joint tree
        R = rodrigues(pose.reshape(-1, 3)).reshape(B, K, 3, 3)
        G_R = [None] * K
        G_t = [None] * K
        G_R[0] = R[:, 0]
        G_t[0] = J[:, 0]
        for i in range(1, K):
            p = self.parents[i]
            G_R[i] = G_R[p] @ R[:, i]
            G_t[i] = (G_R[p] @ (J[:, i] - J[:, p])[..., None])[..., 0] + G_t[p]
        G_R = jnp.stack(G_R, axis=1)                              # (B,16,3,3)
        G_t = jnp.stack(G_t, axis=1)                              # (B,16,3)

        # remove rest pose: t' = t - G_R @ J  (reference MANOLayer.py:169-175)
        t_skin = G_t - (G_R @ J[..., None])[..., 0]

        # LBS: per-vertex blended rotation/translation
        W = self.weights                                          # (778, 16)
        R_v = jnp.einsum("vj,bjmn->bvmn", W, G_R)                 # (B,778,3,3)
        t_v = jnp.einsum("vj,bjm->bvm", W, t_skin)                # (B,778,3)
        v = (R_v @ v_posed[..., None])[..., 0] + t_v              # (B,778,3)

        # joints: kintree translations + 5 fingertip vertices
        jtr = [G_t[:, j] for j in range(K)]
        for slot, vid in zip(_TIP_SLOTS, _TIP_VERTS):
            jtr.insert(slot, v[:, vid])
        joints = jnp.stack(jtr, axis=1)                           # (B, 21, 3)

        # global orientation applied last (reference MANOLayer.py:188-205)
        Rg = rodrigues(rots)                                      # (B, 3, 3)
        vertices = jnp.einsum("bmn,bvn->bvm", Rg, v)
        joints = jnp.einsum("bmn,bjn->bjm", Rg, joints)
        return vertices, joints
