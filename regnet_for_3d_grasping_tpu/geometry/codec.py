"""Grasp parameterization codec and anchor templates.

A grasp is the 8-vector ``(center[3], axis_y[3], theta, score)`` (reference
format documented at ``utils.py:442-447``); its frame is the 3x3 rotation
``[approach | axis_y | minor_normal]``.  This module implements both
directions of the codec, vectorized over arbitrary leading axes:

  * ``frames_to_grasps``  — reference ``_transform_grasp``
    (get_regiondataset.py:136-199): theta = atan2(x_z, z_z) with y-flip
    canonicalization (axis_y.x >= 0) and wrap to (-pi, pi].
  * ``grasps_to_frames``  — reference ``_inv_transform_grasp``
    (get_regiondataset.py:201-269) / ``inv_transform_predicted_grasp``
    (evaluation_data_generator.py:107-162): Gram-Schmidt frame from axis_y
    then rotate about y by theta.

Plus the 4 orientation anchor templates (gripper_region_network.py:552-587)
and the cosine dissimilarity used for anchor assignment (grn:589-610).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_EPS = 1e-12


def anchor_templates() -> jax.Array:
    """The 4 unit orientation anchors x theta=0 -> [4, 4] (rx,ry,rz,theta).

    Reference stores these half-precision (grn:586); kept f32 here — the
    values are exact to ~3 decimals either way and f32 avoids needless
    casts on TPU.
    """
    s3 = math.sqrt(3.0) / 3.0
    t_r = jnp.array([[s3, s3, s3], [s3, s3, -s3],
                     [s3, -s3, -s3], [s3, -s3, s3]], dtype=jnp.float32)
    t_theta = jnp.zeros((4, 1), dtype=jnp.float32)
    return jnp.concatenate([t_r, t_theta], axis=-1)


def cos_dissimilarity(a: jax.Array, b: jax.Array) -> jax.Array:
    """1 - cos(a, b) along the last axis (grn ``compute_cos_sim``)."""
    ab = jnp.sum(a * b, axis=-1)
    a2 = jnp.sum(a * a, axis=-1) + _EPS
    b2 = jnp.sum(b * b, axis=-1) + _EPS
    return 1.0 - ab / jnp.sqrt(a2 * b2)


def _safe_normalize(v: jax.Array, fallback: jax.Array) -> jax.Array:
    """Normalize rows of v, substituting `fallback` for zero rows.

    The reference adds 1e-12 to the norm and then patches exact-zero rows
    (grn:468-489); branch-free equivalent.
    """
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    unit = v / (norm + _EPS)
    return jnp.where(norm > _EPS, unit, fallback)


def grasps_to_frames(grasp: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Decode grasp vectors to frames.

    Args:
      grasp: [..., >=7] with (center[3], axis_y[3], theta, ...).

    Returns:
      frame: [..., 3, 3] columns (approach, axis_y, minor_normal).
      center: [..., 3].
    """
    center = grasp[..., :3]
    axis_y = grasp[..., 3:6]
    theta = grasp[..., 6]

    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    zeros = jnp.zeros_like(cos_t)
    ones = jnp.ones_like(cos_t)
    # rotation about y by theta (grn:463-464)
    r1 = jnp.stack([
        jnp.stack([cos_t, zeros, -sin_t], axis=-1),
        jnp.stack([zeros, ones, zeros], axis=-1),
        jnp.stack([sin_t, zeros, cos_t], axis=-1),
    ], axis=-2)

    ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), axis_y.shape)
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), axis_y.shape)
    ez = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), axis_y.shape)

    axis_y = _safe_normalize(axis_y, ey)
    axis_x = jnp.stack([axis_y[..., 1], -axis_y[..., 0],
                        jnp.zeros_like(theta)], axis=-1)
    axis_x = _safe_normalize(axis_x, ex)
    axis_z = _safe_normalize(jnp.cross(axis_x, axis_y), ez)

    m = jnp.stack([axis_x, axis_y, axis_z], axis=-1)      # columns
    m = jnp.einsum("...ij,...jk->...ik", m, r1)
    approach = _safe_normalize(m[..., 0], ex)
    minor = jnp.cross(approach, axis_y)
    frame = jnp.stack([approach, axis_y, minor], axis=-1)
    return frame, center


def frames_to_grasps(frame: jax.Array, center: jax.Array,
                     scores: jax.Array) -> jax.Array:
    """Encode frames to grasp vectors with y-flip canonicalization.

    Args:
      frame: [..., 3, 3] columns (axis_x, axis_y, axis_z).
      center: [..., 3].
      scores: [..., S] trailing score channels.

    Returns:
      [..., 7 + S] grasp vectors (center, axis_y, theta, scores).
    """
    axis_x = frame[..., :, 0]
    axis_y = frame[..., :, 1]
    axis_z = frame[..., :, 2]

    angle = jnp.arctan2(axis_x[..., 2], axis_z[..., 2])
    flip = axis_y[..., 0] < 0
    angle = jnp.where(flip, jnp.pi - angle, angle)
    axis_y = jnp.where(flip[..., None], -axis_y, axis_y)
    # wrap to (-pi, pi] (get_regiondataset.py:166-169)
    angle = jnp.where(angle >= 2 * jnp.pi, angle - 2 * jnp.pi, angle)
    angle = jnp.where(angle <= -2 * jnp.pi, angle + 2 * jnp.pi, angle)
    angle = jnp.where(angle > jnp.pi, angle - 2 * jnp.pi, angle)
    angle = jnp.where(angle <= -jnp.pi, angle + 2 * jnp.pi, angle)

    return jnp.concatenate(
        [center, axis_y, angle[..., None], scores], axis=-1)
