"""Synthetic tabletop grasp scenes.

The reference trains on a private pickle dataset (scoredataset.py:60-81 keys:
view_cloud / view_cloud_color / view_cloud_score / view_cloud_label +
select_frame / select_*_score label arrays + scene_cloud for the evaluator).
That data is not shipped, so this module generates physically-plausible
scenes in exactly that schema: spheres and boxes on a table, per-point
graspability scores, and top-down GT grasp frames — enough to exercise
training, evaluation and benchmarking end-to-end.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

TABLE_HEIGHT = 0.75


def _sample_sphere(rng, center, radius, n):
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return center + radius * v, v      # outward normal = radial


def _sample_box(rng, center, size, n):
    pts = rng.uniform(-0.5, 0.5, (n, 3)) * size
    # push points to a random face to make it a surface sample
    face = rng.randint(0, 3, n)
    sign = rng.choice([-0.5, 0.5], n)
    pts[np.arange(n), face] = sign * size[face]
    normals = np.zeros((n, 3))
    normals[np.arange(n), face] = np.sign(sign)
    return center + pts, normals


def make_synthetic_scene(seed: int, num_view: int = 12000,
                         num_objects: int = 4,
                         scene_multiple: int = 4) -> dict:
    """Build one scene dict in the reference pickle schema."""
    rng = np.random.RandomState(seed)

    obj_pts, obj_normals, obj_labels, obj_tops = [], [], [], []
    n_obj_pts = int(num_view * 0.6) // num_objects
    for i in range(num_objects):
        cx, cy = rng.uniform(-0.25, 0.25, 2)
        if rng.rand() < 0.5:
            r = rng.uniform(0.02, 0.035)
            cz = TABLE_HEIGHT + r
            pts, nrm = _sample_sphere(rng, np.array([cx, cy, cz]), r,
                                      n_obj_pts)
            top = np.array([cx, cy, cz + r])
        else:
            size = rng.uniform(0.03, 0.06, 3)
            cz = TABLE_HEIGHT + size[2] / 2
            pts, nrm = _sample_box(rng, np.array([cx, cy, cz]), size,
                                   n_obj_pts)
            top = np.array([cx, cy, cz + size[2] / 2])
        keep = pts[:, 2] >= TABLE_HEIGHT - 1e-4
        obj_pts.append(pts[keep])
        obj_normals.append(nrm[keep])
        obj_labels.append(np.full(keep.sum(), i + 1))
        obj_tops.append(top)

    n_table = num_view - sum(len(p) for p in obj_pts)
    table = np.c_[rng.uniform(-0.35, 0.35, (n_table, 2)),
                  np.full(n_table, TABLE_HEIGHT)]
    table_n = np.tile([0.0, 0.0, 1.0], (n_table, 1))
    view = np.concatenate(obj_pts + [table]).astype(np.float32)
    view_normal = np.concatenate(obj_normals + [table_n]).astype(
        np.float32)
    label = np.concatenate(obj_labels + [np.zeros(n_table)]).astype(
        np.float32)

    # graspability: object points score by height above table (squashed),
    # table points 0 — same [0, inf) raw range the reference tanh-squashes
    h = np.maximum(view[:, 2] - TABLE_HEIGHT, 0.0)
    score = np.where(label > 0, h / max(h.max(), 1e-6) * 2.0, 0.0).astype(
        np.float32)
    color = rng.rand(num_view, 3).astype(np.float32)

    # GT grasps: top-down pinches engaging the top `grab` of each object.
    # The frame translation is the hand base: the fingertips reach
    # translation + depth*approach, so with approach = -z the base sits
    # depth-grab above the object top and the closing region covers its
    # top `grab` metres (keeps fingers clear of the table for objects
    # taller than grab - 0.005).
    depth, grab = 0.06, 0.025
    frames, ascore = [], []
    for top in obj_tops:
        for t in np.linspace(-np.pi / 2, np.pi / 2, 5):
            approach = np.array([0.0, 0.0, -1.0])
            y = np.array([np.cos(t), np.sin(t), 0.0])
            if y[0] < 0:
                y = -y
            z = np.cross(approach, y)
            base = top + np.array([0.0, 0.0, depth - grab])
            frame = np.c_[approach, y, z, base]
            frames.append(frame)
            ascore.append(0.5 + 0.5 * np.cos(t) ** 2)
    frames = np.asarray(frames, np.float32)
    ascore = np.asarray(ascore, np.float32)

    n_scene = num_view * scene_multiple
    idx = np.random.RandomState(seed + 1).randint(0, num_view, n_scene)
    scene = view[idx] + rng.randn(n_scene, 3).astype(np.float32) * 1e-4
    normal = view_normal[idx]    # exact analytic surface normals

    return {
        "view_cloud": view,
        "view_cloud_color": color,
        "view_cloud_score": score,
        "view_cloud_label": label,
        "select_frame": frames,
        "select_antipodal_score": ascore,
        "select_center_score": ascore,
        "select_vertical_score": ascore,
        "select_frame_label": np.ones(len(frames), np.float32),
        "scene_cloud": scene,
        "scene_normal": normal,
    }


def write_synthetic_dataset(path: str, num_scenes: int = 8,
                            num_view: int = 12000, seed: int = 0) -> list:
    """Write `num_scenes` scene pickles named like the reference data
    (``{scene}_view_{view}.p``) under ``path/training_data``."""
    out_dir = os.path.join(path, "training_data")
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(num_scenes):
        scene = make_synthetic_scene(seed + i, num_view=num_view)
        p = os.path.join(out_dir, f"{i:04d}_view_{i % 4}.p")
        with open(p, "wb") as f:
            pickle.dump(scene, f)
        paths.append(p)
    return paths
