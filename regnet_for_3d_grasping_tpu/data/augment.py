"""Geometric training augmentation: rigid scene jitter + Kinect sensor noise.

Why this exists (round-4 real-data evidence): the synthetic training
scenes (data/synthetic.py) are analytically noiseless — table exactly at
z=0.75, exact surface samples — while the reference's committed real
Kinect clouds (test_file/real_data_predict/) have their table plane at
z~0.695 (cloud 0000) and carry depth-dependent axial noise, lateral
jitter and depth quantization.  A model trained only on the noiseless
distribution fails the above-table and finger-collision checks on real
geometry (docs/evidence/real_data_r4_retrained.json funnel).

Two independent augmentations, both applied on the host to a loader
SceneBatch (one implementation serves the Python and native loaders —
the batch-level hook in cli/train.py runs after either):

* **Rigid jitter** — one global rotation about z (around the view
  cloud's xy centroid) plus a global (x, y, z) translation per scene.
  View points and GT grasp frames transform together, so every loss is
  geometrically consistent; the per-point score/label GT rides along
  unchanged.  Teaches invariance to table height and workspace placement
  (the reference trained on real variability; utils.py:426-447 shows its
  clouds arrive through per-camera extrinsics, i.e. were never pinned to
  an exact table plane).
* **Kinect sensor noise** — the Nguyen, Izadi, Lovell (2012) Kinect v1
  noise model: range-dependent axial sigma, lateral jitter linear in
  range, depth re-quantization, plus point dropout-with-replacement
  (the loader's fixed-budget resample does the same on real .pcd
  inputs, cli/infer.py).  Applied to the view cloud ONLY, in the
  original camera frame (eval/evaluator.py CAMERA_POSE by the path's
  view index) BEFORE the rigid jitter; GT stays tied to the clean
  geometry, matching how a real sensor corrupts an observation of an
  uncorrupted scene.

`tools/probe_sensor_noise.py` uses the same `kinect_corrupt` to measure
a checkpoint's robustness to each component in isolation.
"""

from __future__ import annotations

import numpy as np

__all__ = ["kinect_corrupt", "rigid_jitter", "augment_batch"]


def kinect_corrupt(view: np.ndarray, cam: np.ndarray,
                   rng: np.random.RandomState, *, axial: float = 0.0,
                   lateral: float = 0.0, quant: float = 0.0,
                   dropout: float = 0.0, return_index: bool = False):
    """Apply a Kinect-style noise model to a view cloud [N,3].

    axial/lateral scale the Nguyen et al. magnitudes (1.0 = published
    Kinect v1 numbers); quant scales the depth-quantization step;
    dropout drops a fraction of points and resamples with replacement.
    Returns a new [N,3] float32 array; the input is not modified.
    With ``return_index=True`` also returns the [N] dropout-resample
    permutation so callers can permute per-point companions (colors,
    score/label GT) consistently — identity when dropout=0.
    """
    pts = np.asarray(view, np.float64)
    cam = np.asarray(cam, np.float64)
    d = pts - cam
    r = np.linalg.norm(d, axis=1, keepdims=True)
    ray = d / np.maximum(r, 1e-9)
    rr = r[:, 0]
    if axial:
        # sigma_z = 1.2mm + 1.9mm * (r - 0.4)^2  [Nguyen et al. 2012]
        sigma_z = (0.0012 + 0.0019 * (rr - 0.4) ** 2) * axial
        pts = pts + ray * (rng.randn(len(pts), 1) * sigma_z[:, None])
    if lateral:
        # ~0.815 mm at 1 m, linear in range; isotropic in the plane
        # perpendicular to the ray.
        sigma_l = 0.000815 * rr * lateral
        t1 = np.cross(ray, np.array([0.0, 0.0, 1.0]))
        n1 = np.linalg.norm(t1, axis=1, keepdims=True)
        # rays near ±z make cross(ray, z) vanish — fall back to the x
        # axis there so vertical returns still get lateral jitter
        t1_alt = np.cross(ray, np.array([1.0, 0.0, 0.0]))
        t1 = np.where(n1 < 1e-6, t1_alt, t1)
        t1 /= np.maximum(np.linalg.norm(t1, axis=1, keepdims=True), 1e-9)
        t2 = np.cross(ray, t1)
        t2 /= np.maximum(np.linalg.norm(t2, axis=1, keepdims=True), 1e-9)
        pts = pts + t1 * (rng.randn(len(pts), 1) * sigma_l[:, None]) \
                  + t2 * (rng.randn(len(pts), 1) * sigma_l[:, None])
    if quant:
        # Kinect depth resolution ~2.73e-3 * r^2 (meters): re-snap the
        # range to that grid.
        d2 = pts - cam
        r2 = np.linalg.norm(d2, axis=1, keepdims=True)
        step = np.maximum(2.73e-3 * r2 ** 2 * quant, 1e-6)
        snapped = np.round(r2 / step) * step
        pts = cam + d2 / np.maximum(r2, 1e-9) * snapped
    sel = np.arange(len(pts))
    if dropout:
        keep = rng.rand(len(pts)) >= dropout
        idx = np.flatnonzero(keep)
        if len(idx) == 0:
            idx = np.arange(len(pts))
        sel = rng.choice(idx, len(pts), replace=True)
        pts = pts[sel]
    pts = pts.astype(np.float32)
    return (pts, sel) if return_index else pts


def rigid_jitter(rng: np.random.RandomState, severity: float = 1.0):
    """Sample one global rigid transform: (R[3,3], t[3]).

    Rotation is about +z by U(0, 2pi) (full rotational symmetry of a
    tabletop scene — severity does not shrink it, an orientation is not
    "noise"); translation is z ~ U(-0.06, 0.03) and x,y ~ U(-0.05, 0.05),
    ranges scaled by min(severity, 1).  The z range is asymmetric toward
    lower tables because the real evidence clouds sit BELOW the synthetic
    0.75 plane (0000_cloud table plane ~0.695).
    """
    s = min(float(severity), 1.0)
    ang = rng.uniform(0.0, 2.0 * np.pi) if severity > 0 else 0.0
    c, sn = np.cos(ang), np.sin(ang)
    rot = np.array([[c, -sn, 0.0], [sn, c, 0.0], [0.0, 0.0, 1.0]],
                   np.float64)
    t = np.array([rng.uniform(-0.05, 0.05) * s,
                  rng.uniform(-0.05, 0.05) * s,
                  rng.uniform(-0.06, 0.03) * s], np.float64)
    return rot, t


def _transform_scene(view: np.ndarray, frames: np.ndarray,
                     rot: np.ndarray, t: np.ndarray):
    """Rotate about the view cloud's xy centroid, then translate.

    frames: [G,3,4] GT grasp frames (columns approach/y/z axes + base).
    """
    pivot = view.mean(0)
    pivot[2] = 0.0   # rotate about a vertical axis through the centroid
    new_view = (view - pivot) @ rot.T + pivot + t
    new_frames = frames.copy()
    new_frames[:, :, :3] = np.einsum("ij,gjk->gik", rot, frames[:, :, :3])
    new_frames[:, :, 3] = (frames[:, :, 3] - pivot) @ rot.T + pivot + t
    return new_view.astype(np.float32), new_frames.astype(np.float32)


def augment_batch(batch, rng: np.random.RandomState, severity: float,
                  cameras: np.ndarray):
    """Geometric augmentation of a loader SceneBatch (data/dataset.py).

    severity: 0 disables (returns the batch unchanged); 1.0 is the
    designed distribution (published Kinect v1 noise magnitudes, 10%
    dropout, full z rotation, cm-scale translation).  `cameras` is a
    per-scene [B,3] array of camera positions (for noise ray geometry —
    eval/evaluator.py view_num_from_path + CAMERA_POSE).
    Returns a new SceneBatch; widths/paths are shared.  The dropout
    resample permutes points, so the per-point companions (colors,
    score and label GT) are permuted with the same index — a point's
    supervision always rides with its coordinates.
    """
    if severity <= 0.0:
        return batch
    s = float(severity)
    pc = batch.pc.copy()
    score = batch.score.copy()
    label = batch.label.copy()
    frames = batch.gt_frames.copy()
    for b in range(pc.shape[0]):
        view, sel = kinect_corrupt(
            pc[b, :, :3], cameras[b], rng,
            axial=s, lateral=s, quant=s, dropout=0.1 * min(s, 1.0),
            return_index=True)
        rot, t = rigid_jitter(rng, s)
        view, frames[b] = _transform_scene(view, frames[b], rot, t)
        pc[b, :, :3] = view
        pc[b, :, 3:] = pc[b, sel, 3:]
        score[b] = score[b, sel]
        label[b] = label[b, sel]
    return batch._replace(pc=pc, score=score, label=label,
                          gt_frames=frames)
