"""Rotation-matrix builders and axis-angle conversion.

TPU-native (pure jnp, batch-first, fixed shapes) equivalents of the
reference's rotation helpers:

* ``atan2_safe``       -- reference utils/canonical_trafo.py:23-40 (custom
  atan2 built from atan + quadrant corrections; kept bit-compatible because
  its 1e-8 guard shifts results slightly vs true atan2 near the axes).
* ``rot_mat_x/y/z``    -- reference utils/canonical_trafo.py:64-91.
* ``euler_xyz_rot_mat``-- reference utils/general.py:59-97
  (``get_right_hand_batch_rotation_matrix``): R = Rx @ Ry @ Rz.
* ``axis_angle_rot_mat`` -- reference utils/general.py:191-226
  (``_get_rot_mat``): Rodrigues form with the angle encoded as the norm of
  the axis vector (plus the reference's 1e-8 inside the sqrt).

All functions accept arbitrary leading batch dimensions where noted.
"""

from __future__ import annotations

import jax.numpy as jnp

_PI = 3.141592653589793


def atan2_safe(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """atan2 in (-pi, pi] via atan + quadrant correction, matching the
    reference's hand-rolled variant (utils/canonical_trafo.py:23-40)."""
    tan = jnp.arctan(y / (x + 1e-8))
    tan = jnp.where(x + 1e-8 < 0.0, tan + _PI, tan)
    tan = jnp.where(tan < 0.0, tan + 2.0 * _PI, tan)
    tan = jnp.where(tan > _PI, tan - 2.0 * _PI, tan)
    return tan


def _stitch(rows) -> jnp.ndarray:
    """Stack 9 same-shaped arrays (...,) into (..., 3, 3), row-major."""
    m = jnp.stack(rows, axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def rot_mat_x(angle: jnp.ndarray) -> jnp.ndarray:
    """(...,) -> (..., 3, 3) rotation about x."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(angle), jnp.zeros_like(angle)
    return _stitch([o, z, z, z, c, -s, z, s, c])


def rot_mat_y(angle: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(angle), jnp.zeros_like(angle)
    return _stitch([c, z, s, z, o, z, -s, z, c])


def rot_mat_z(angle: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(angle), jnp.zeros_like(angle)
    return _stitch([c, -s, z, s, c, z, z, z, o])


def euler_xyz_rot_mat(angles: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) euler angles -> (..., 3, 3), R = Rx @ Ry @ Rz.

    Matches reference utils/general.py:59-97 (right-hand batch variant).
    """
    rx = rot_mat_x(angles[..., 0])
    ry = rot_mat_y(angles[..., 1])
    rz = rot_mat_z(angles[..., 2])
    return rx @ ry @ rz


def axis_angle_rot_mat(u: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (angle encoded as |u|) -> rotation matrix.

    Args:
      u: (..., 3) axis-angle parameters.
    Returns:
      (..., 3, 3) rotation matrices.

    Matches reference utils/general.py:191-226 including the ``+1e-8``
    inside the norm (which regularises the zero-rotation case).
    """
    ux, uy, uz = u[..., 0], u[..., 1], u[..., 2]
    norm = jnp.sqrt(ux * ux + uy * uy + uz * uz + 1e-8)
    theta = norm
    st, ct = jnp.sin(theta), jnp.cos(theta)
    one_ct = 1.0 - ct
    nf = 1.0 / norm
    x, y, z = ux * nf, uy * nf, uz * nf
    return _stitch([
        ct + x * x * one_ct, x * y * one_ct - z * st, x * z * one_ct + y * st,
        y * x * one_ct + z * st, ct + y * y * one_ct, y * z * one_ct - x * st,
        z * x * one_ct - y * st, z * y * one_ct + x * st, ct + z * z * one_ct,
    ])


def rodrigues(r: jnp.ndarray, small_angle_eps: float = 1e-30) -> jnp.ndarray:
    """Classic Rodrigues with a Taylor fallback for tiny angles.

    Args:
      r: (..., 3) rotation vectors (angle = |r|).
    Returns:
      (..., 3, 3) rotation matrices.

    Matches the MANO layer's rodrigues (reference MANOLayer.py:82-112):
    closed form, replaced by the 2nd-order Taylor expansion when
    ``theta < 1e-30``.  Implemented branch-free with jnp.where so it jits.
    """
    theta2 = jnp.sum(r * r, axis=-1)
    # Select small-angle entries from theta^2 and GUARD THE SQRT INPUT:
    # sqrt has an infinite derivative at 0, which leaks NaN into the
    # gradient through both sides of the final jnp.where (0 * inf), so
    # grad-at-zero-rotation (the natural init for MANO thetas) would be
    # NaN if we took sqrt(theta2) unguarded.
    small_flat = theta2 <= small_angle_eps * small_angle_eps
    theta = jnp.sqrt(jnp.where(small_flat, 1.0, theta2))
    n = r / theta[..., None]

    def skew(v):
        vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
        z = jnp.zeros_like(vx)
        return _stitch([z, -vz, vy, vz, z, -vx, -vy, vx, z])

    sn = skew(n)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), sn.shape)
    st = jnp.sin(theta)[..., None, None]
    ct = jnp.cos(theta)[..., None, None]
    R = eye + st * sn + (1.0 - ct) * (sn @ sn)

    sr = skew(r)
    t2 = theta2[..., None, None]
    R_small = eye + (1.0 - t2 / 6.0) * sr + (0.5 - t2 / 24.0) * (sr @ sr)

    return jnp.where(small_flat[..., None, None], R_small, R)
