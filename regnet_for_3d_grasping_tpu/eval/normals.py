"""Point-cloud normal estimation on TPU.

Replaces the reference's open3d dependency
(``eval_utils/pointcloud.py:27-43``: KDTreeSearchParamHybrid(radius=0.01,
max_nn=30) PCA normals oriented toward the camera).  open3d is not in this
image, and a host KD-tree round-trip per scene would serialize the
evaluator anyway — so normals are computed on-device:

  neighbourhood -> masked second moments: the in-radius mask [chunk, N]
                  is contracted against precomputed per-point moment rows
                  [N, 9] on the MXU, so the covariance of every in-radius
                  neighbour is accumulated with NO top-k and NO gather
                  (method="moment", default).  method="knn" keeps the
                  reference's hybrid <=30-nearest-in-radius neighbourhood
                  (chunked lax.top_k) for open3d-exact parity checks.
  PCA          -> analytic smallest eigenvector of the 3x3 covariance
                  (trigonometric eigenvalues + cross-product nullspace;
                  no jnp.linalg.eigh, which lowers poorly for tiny batched
                  matrices on TPU)
  orientation  -> flip toward the camera position

For PCA normals the moment path is a strict superset neighbourhood (all
in-radius points instead of the 30 nearest); open3d's max_nn cap is a
KD-tree speed knob, not an estimator choice, and with r=1cm scene clouds
average well under 30 in-radius neighbours anyway.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from regnet_for_3d_grasping_tpu.ops.distances import bpdist2


def smallest_eigvec_3x3(A: jax.Array) -> jax.Array:
    """Unit eigenvector of the smallest eigenvalue of symmetric [..., 3, 3].

    Trigonometric closed form (stable for PSD covariance matrices) followed
    by a branch-free cross-product nullspace extraction.
    """
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    eye = jnp.eye(3, dtype=A.dtype)
    B = A - q[..., None, None] * eye
    p2 = jnp.sum(jnp.square(B), axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detB = jnp.linalg.det(B)
    r = jnp.clip(detB / (2.0 * p ** 3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    C = A - lam_min[..., None, None] * eye
    r0, r1, r2 = C[..., 0, :], C[..., 1, :], C[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    cands = jnp.stack([c01, c02, c12], axis=-2)          # [..., 3, 3]
    norms = jnp.linalg.norm(cands, axis=-1)
    best = jnp.argmax(norms, axis=-1)
    vec = jnp.take_along_axis(cands, best[..., None, None],
                              axis=-2)[..., 0, :]
    n = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    fallback = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], A.dtype), vec.shape)
    return jnp.where(n > 1e-12, vec / jnp.maximum(n, 1e-12), fallback)


def estimate_normals(points: jax.Array, camera_pos: jax.Array,
                     radius: float = 0.01, max_nn: int = 30,
                     chunk: int = 4096,
                     method: str = "knn") -> jax.Array:
    """[N, 3] points -> [N, 3] unit normals oriented toward `camera_pos`.

    method="knn" (default) reproduces the reference's open3d hybrid
    search (radius cap + 30-NN, eval_utils/pointcloud.py:27-43) and is
    the parity choice; method="moment" uses ALL in-radius points via one
    masked-moment MXU pass — ~6x faster on large scene clouds and the
    evaluator's explicit choice (eval/evaluator.py), with a documented
    sub-0.5% effect on VGR/antipodal metrics (docs/evidence/TRAINING.md).
    """
    points = points.astype(jnp.float32)
    N = points.shape[0]
    r2 = jnp.float32(radius * radius)

    pad = (-N) % chunk
    padded = jnp.concatenate(
        [points, jnp.full((pad, 3), 1e10, points.dtype)]) if pad else points
    n_chunks = padded.shape[0] // chunk
    q_chunks = padded.reshape(n_chunks, chunk, 3)

    # Center the cloud so the E[ppT] - mu muT cancellation happens on O(r)
    # magnitudes instead of O(scene) ones (the surviving sums only hold
    # ~count<=O(10^2) in-radius terms, so f32 accumulation is exact enough).
    centroid = jnp.mean(points, axis=0)
    pts_c = points - centroid
    x, y, z = pts_c[:, 0], pts_c[:, 1], pts_c[:, 2]
    # per-point moment rows: [N, 9] = (x, y, z, xx, yy, zz, xy, xz, yz)
    mom = jnp.stack([x, y, z, x * x, y * y, z * z,
                     x * y, x * z, y * z], axis=1)

    def per_chunk_moment(q):
        d2 = bpdist2(q[None], points[None])[0]          # [chunk, N]
        w = (d2 <= r2).astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
        s = jnp.matmul(w, mom,
                       precision=lax.Precision.HIGHEST) / cnt[:, None]
        m1, m2 = s[:, :3], s[:, 3:]
        xx, yy, zz, xy, xz, yz = (m2[:, 0], m2[:, 1], m2[:, 2],
                                  m2[:, 3], m2[:, 4], m2[:, 5])
        cov = jnp.stack([
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1)], axis=-2)
        cov = cov - m1[:, :, None] * m1[:, None, :]
        return smallest_eigvec_3x3(cov)

    def per_chunk_knn(q):
        d2 = bpdist2(q[None], points[None])[0]          # [chunk, N]
        neg, idx = lax.top_k(-d2, max_nn)
        d2k = -neg                                      # ascending
        valid = d2k <= r2
        neigh = points[idx]                             # [chunk, K, 3]
        w = valid.astype(jnp.float32)[..., None]
        cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
        mean = jnp.sum(neigh * w, axis=1) / cnt
        diff = (neigh - mean[:, None, :]) * w
        cov = jnp.einsum("nki,nkj->nij", diff, diff,
                         precision=lax.Precision.HIGHEST) / cnt[..., None]
        return smallest_eigvec_3x3(cov)

    per_chunk = per_chunk_moment if method == "moment" else per_chunk_knn
    normals = lax.map(per_chunk, q_chunks).reshape(-1, 3)[:N]

    to_cam = camera_pos[None, :] - points
    sign = jnp.sign(jnp.sum(normals * to_cam, axis=-1, keepdims=True))
    sign = jnp.where(sign == 0, 1.0, sign)
    return normals * sign
