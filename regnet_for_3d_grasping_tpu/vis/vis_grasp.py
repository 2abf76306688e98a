"""Grasp visualization without a display server.

Port of ``vis/vis_grasp.py`` + ``vis/visualization_utils.py``: decode a
prediction pickle, build the 3-box gripper geometry (back hand + two
fingers) per grasp, and render.  open3d isn't in this image, so the primary
output is a colored ASCII PLY (cloud points + gripper box edges as line
elements) viewable in MeshLab/CloudCompare/Blender; if open3d happens to be
importable an interactive window is used instead.

The highest-scoring grasp is red, the rest green (vis_grasp.py:110-116).
"""

from __future__ import annotations

import pickle
from typing import List, Optional, Tuple

import numpy as np

from regnet_for_3d_grasping_tpu.utils.config import GripperConfig


def _box_corners(center, size):
    cx, cy, cz = center
    sx, sy, sz = size
    corners = []
    for dx in (-0.5, 0.5):
        for dy in (-0.5, 0.5):
            for dz in (-0.5, 0.5):
                corners.append([cx + dx * sx, cy + dy * sy, cz + dz * sz])
    return np.array(corners)


_BOX_EDGES = np.array([
    [0, 1], [0, 2], [1, 3], [2, 3],
    [4, 5], [4, 6], [5, 7], [6, 7],
    [0, 4], [1, 5], [2, 6], [3, 7]])


def gripper_hand_boxes(frame: np.ndarray, center: np.ndarray,
                       gripper: GripperConfig
                       ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Local->world gripper geometry as 3 wireframe boxes.

    Mirrors ``get_hand_geometry`` (visualization_utils.py:15-52): a back
    hand slab behind x=0 and two finger slabs spanning the closing depth.
    Returns [(corners [8,3], edges [12,2])] x 3 in world coordinates.
    """
    w, h, d = gripper.width, gripper.height, gripper.depth
    fw = gripper.finger_width
    boxes_local = [
        # back hand: behind the closing region
        (np.array([-fw / 2, 0, 0]), np.array([fw, w + 2 * fw, h])),
        # left finger
        (np.array([d / 2, (w + fw) / 2, 0]), np.array([d, fw, h])),
        # right finger
        (np.array([d / 2, -(w + fw) / 2, 0]), np.array([d, fw, h])),
    ]
    out = []
    for c_local, size in boxes_local:
        corners = _box_corners(c_local, size) @ frame.T + center
        out.append((corners, _BOX_EDGES))
    return out


def write_ply(path: str, points: np.ndarray, colors: np.ndarray,
              boxes: List[Tuple[np.ndarray, np.ndarray, np.ndarray]]):
    """ASCII PLY with a vertex list and colored edges.

    boxes: list of (corners [8,3], edges [12,2], rgb [3] in 0..255).
    """
    box_verts, box_edges, box_colors = [], [], []
    off = len(points)
    for corners, edges, rgb in boxes:
        box_edges.append(edges + off)
        box_verts.append(corners)
        box_colors.append(np.tile(rgb, (len(corners), 1)))
        off += len(corners)
    all_pts = np.concatenate([points] + box_verts) if boxes else points
    pt_colors = np.clip(colors * 255, 0, 255).astype(np.uint8)
    all_colors = np.concatenate(
        [pt_colors] + box_colors).astype(np.uint8) if boxes else pt_colors
    edges = np.concatenate(box_edges) if boxes else np.zeros((0, 2), int)

    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(all_pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\n"
                "property uchar blue\n")
        f.write(f"element edge {len(edges)}\n")
        f.write("property int vertex1\nproperty int vertex2\nend_header\n")
        for p, c in zip(all_pts, all_colors):
            f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f} "
                    f"{c[0]} {c[1]} {c[2]}\n")
        for e in edges:
            f.write(f"{e[0]} {e[1]}\n")


def show_grasp(path: str, stage: str = "grasp_stage2",
               score_thre: Optional[float] = None,
               out_path: Optional[str] = None,
               gripper: Optional[GripperConfig] = None) -> str:
    """Render one prediction pickle (vis_grasp.py:87-124).

    Returns the output PLY path (or opens an open3d window when available).
    """
    from regnet_for_3d_grasping_tpu.geometry.codec import grasps_to_frames
    import jax.numpy as jnp

    gripper = gripper or GripperConfig()
    with open(path, "rb") as f:
        data = pickle.load(f)
    points = np.asarray(data["points"], np.float32)
    colors = np.asarray(data.get("colors", np.ones_like(points) * 0.6),
                        np.float32)
    grasps = np.asarray(data[stage], np.float32)
    if score_thre is not None and len(grasps):
        grasps = grasps[grasps[:, 7] > score_thre]

    boxes = []
    if len(grasps):
        frames, centers = grasps_to_frames(jnp.asarray(grasps[:, :8]))
        frames, centers = np.asarray(frames), np.asarray(centers)
        best = int(np.argmax(grasps[:, 7]))
        for i in range(len(grasps)):
            rgb = np.array([255, 0, 0]) if i == best \
                else np.array([0, 180, 0])
            for corners, edges in gripper_hand_boxes(
                    frames[i], centers[i], gripper):
                boxes.append((corners, edges, rgb))

    out_path = out_path or path.replace(".p", f"_{stage}.ply")
    write_ply(out_path, points, colors, boxes)
    return out_path


if __name__ == "__main__":
    import sys
    p = show_grasp(sys.argv[1],
                   sys.argv[2] if len(sys.argv) > 2 else "grasp_stage2")
    print(p)
