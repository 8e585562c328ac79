"""Keypoint / skeleton visualization.

TPU-native equivalent of reference utils/plot_anno.py:9-83 and
utils/vis.py:77-130: renders predicted vs GT 2-D keypoints and the hand
skeleton onto images.  Uses cv2 drawing into numpy arrays (no matplotlib
in the hot path).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

# RHD-order skeleton edges (root -> finger chains), matching the bone
# structure in reference utils/vis.py:77-130
_EDGES_RHD = [(0, 4), (4, 3), (3, 2), (2, 1),
              (0, 8), (8, 7), (7, 6), (6, 5),
              (0, 12), (12, 11), (11, 10), (10, 9),
              (0, 16), (16, 15), (15, 14), (14, 13),
              (0, 20), (20, 19), (19, 18), (18, 17)]

# MANO order (after the joint switch): chains run root-side -> tip
_EDGES_MANO = [(0, 1), (1, 2), (2, 3), (3, 4),
               (0, 5), (5, 6), (6, 7), (7, 8),
               (0, 9), (9, 10), (10, 11), (11, 12),
               (0, 13), (13, 14), (14, 15), (15, 16),
               (0, 17), (17, 18), (18, 19), (19, 20)]


def to_uint8_image(img: np.ndarray) -> np.ndarray:
    """float image in [-0.5, 0.5] (the pipeline's convention) -> uint8."""
    return np.clip((np.asarray(img) + 0.5) * 255.0, 0, 255).astype(np.uint8)


def draw_keypoints(image: np.ndarray, uv: np.ndarray,
                   vis: np.ndarray | None = None,
                   color=(0, 255, 0), joint_order: str = "mano",
                   radius: int = 2) -> np.ndarray:
    """Draw 21 keypoints + skeleton; returns a copy."""
    out = np.ascontiguousarray(image.copy())
    edges = _EDGES_MANO if joint_order == "mano" else _EDGES_RHD
    uv = np.asarray(uv)
    v = (np.ones(len(uv), bool) if vis is None
         else np.asarray(vis).reshape(-1).astype(bool))
    for a, b in edges:
        if v[a] and v[b]:
            pa = tuple(np.round(uv[a]).astype(int))
            pb = tuple(np.round(uv[b]).astype(int))
            cv2.line(out, pa, pb, color, 1)
    for i, p in enumerate(uv):
        if v[i]:
            cv2.circle(out, tuple(np.round(p).astype(int)), radius, color, -1)
    return out


def plot_pred_vs_gt(image: np.ndarray, pred_uv: np.ndarray,
                    gt_uv: np.ndarray, vis: np.ndarray | None = None,
                    joint_order: str = "mano") -> np.ndarray:
    """GT in green, prediction in red (reference inference.py:217-225)."""
    out = draw_keypoints(image, gt_uv, vis, (0, 255, 0), joint_order)
    return draw_keypoints(out, pred_uv, vis, (255, 0, 0), joint_order)


def save_image(path: str, image_rgb: np.ndarray) -> None:
    cv2.imwrite(path, image_rgb[:, :, ::-1])


def load_skeleton(path: str, joint_num: int):
    """Parse an InterHand-style skeleton.txt into per-joint parent/children
    (reference utils/preprocessing.py:15-31)."""
    skeleton = [{} for _ in range(joint_num)]
    with open(path) as fp:
        for line in fp:
            if line.startswith("#"):
                continue
            name, jid, pid = line.split(" ")
            jid, pid = int(jid), int(pid)
            skeleton[jid]["name"] = name
            skeleton[jid]["parent_id"] = pid
    for i in range(joint_num):
        skeleton[i]["child_id"] = [j for j in range(joint_num)
                                   if skeleton[j].get("parent_id") == i]
    return skeleton


def plot_3d_keypoints(xyz: np.ndarray, save_path: str,
                      vis: np.ndarray | None = None,
                      joint_order: str = "mano") -> None:
    """Save a 3-D skeleton plot (reference utils/vis.py vis_3d_keypoints
    analogue; matplotlib, off the hot path)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xyz = np.asarray(xyz)
    v = (np.ones(len(xyz), bool) if vis is None
         else np.asarray(vis).reshape(-1).astype(bool))
    edges = _EDGES_MANO if joint_order == "mano" else _EDGES_RHD
    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(xyz[v, 0], xyz[v, 1], xyz[v, 2], c="g", s=12)
    for a, b in edges:
        if v[a] and v[b]:
            ax.plot([xyz[a, 0], xyz[b, 0]], [xyz[a, 1], xyz[b, 1]],
                    [xyz[a, 2], xyz[b, 2]], "b-", linewidth=1)
    ax.set_xlabel("x"); ax.set_ylabel("y"); ax.set_zlabel("z")
    fig.savefig(save_path, dpi=80, bbox_inches="tight")
    plt.close(fig)


def save_scoremap_grid(scoremap: np.ndarray, save_path: str,
                       cols: int = 7) -> None:
    """Tile one sample's (K, H, W) scoremaps into a grid image (the
    reference dataloader __main__'s scoremap plots, dataloaderRHD.py:707+)."""
    sm = np.asarray(scoremap)
    K, H, W = sm.shape
    rows = (K + cols - 1) // cols
    grid = np.zeros((rows * H, cols * W), np.float32)
    for k in range(K):
        r, c = divmod(k, cols)
        grid[r * H:(r + 1) * H, c * W:(c + 1) * W] = sm[k]
    img = np.clip(grid * 255.0, 0, 255).astype(np.uint8)
    cv2.imwrite(save_path, img)


def save_mesh_obj(vertices: np.ndarray, faces: np.ndarray,
                  path: str) -> None:
    """Write a hand mesh as Wavefront OBJ (the reference renders MANO
    meshes via the `mano` pip package, MANOLayer.py:212-236; OBJ export is
    the dependency-free equivalent, viewable in any mesh tool)."""
    v = np.asarray(vertices, np.float32).reshape(-1, 3)
    f = np.asarray(faces, np.int64).reshape(-1, 3)
    with open(path, "w") as fh:
        for p in v:
            fh.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for tri in f + 1:   # OBJ is 1-indexed
            fh.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")


def plot_mesh(vertices: np.ndarray, faces: np.ndarray, save_path: str,
              joints: np.ndarray | None = None) -> None:
    """3-D trisurf render of a hand mesh (+ optional joints)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    v = np.asarray(vertices).reshape(-1, 3)
    f = np.asarray(faces).reshape(-1, 3)
    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(111, projection="3d")
    ax.plot_trisurf(v[:, 0], v[:, 1], v[:, 2], triangles=f,
                    color=(0.96, 0.75, 0.69), edgecolor="none", alpha=0.9)
    if joints is not None:
        j = np.asarray(joints).reshape(-1, 3)
        ax.scatter(j[:, 0], j[:, 1], j[:, 2], c="g", s=14)
    ax.set_box_aspect((1, 1, 1))
    fig.savefig(save_path, dpi=80, bbox_inches="tight")
    plt.close(fig)
