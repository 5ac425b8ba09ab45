"""Batch 3D->2D projection + ray/box visibility helpers (reference:
data/raycasting.py — fork-added utilities used by the 3D visualizers)."""

from __future__ import annotations

from typing import Tuple, Union

import numpy as np


def project_to_image(pts_3d: np.ndarray, calibs: np.ndarray, return_depth: bool = False):
    """pts_3d (B, 3) camera frame + calibs (B or 1, 3, 4) -> (B, 2) pixels."""
    pts_3d = np.asarray(pts_3d, np.float64)
    calibs = np.asarray(calibs, np.float64).reshape(-1, 3, 4)
    homo = np.concatenate([pts_3d, np.ones((pts_3d.shape[0], 1))], axis=1)
    if len(calibs) == len(pts_3d):
        p = np.einsum("bij,bj->bi", calibs, homo)
    else:
        p = np.einsum("ij,bj->bi", calibs[0], homo)
    uv = p[:, :2] / np.maximum(p[:, 2:3], 1e-9)
    if return_depth:
        return uv, p[:, 2]
    return uv


def ray_directions(pts_2d: np.ndarray, calib: np.ndarray) -> np.ndarray:
    """Back-project pixels to unit ray directions. calib (3, 4)."""
    K = np.asarray(calib, np.float64)[:, :3]
    homo = np.concatenate(
        [np.asarray(pts_2d, np.float64), np.ones((len(pts_2d), 1))], axis=1
    )
    rays = np.linalg.solve(K, homo.T).T
    return rays / np.linalg.norm(rays, axis=1, keepdims=True)


def ray_box_intersection(
    origin: np.ndarray, directions: np.ndarray, box_min: np.ndarray, box_max: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Slab-method ray/AABB intersection. directions (N, 3).

    Returns (hit (N,) bool, t_near (N,)). Used for occlusion/visibility checks
    of 3D annotations."""
    directions = np.asarray(directions, np.float64)
    origin = np.asarray(origin, np.float64)
    inv = 1.0 / np.where(np.abs(directions) < 1e-12, 1e-12, directions)
    t0 = (np.asarray(box_min) - origin) * inv
    t1 = (np.asarray(box_max) - origin) * inv
    tmin = np.minimum(t0, t1).max(axis=1)
    tmax = np.maximum(t0, t1).min(axis=1)
    hit = (tmax >= np.maximum(tmin, 0.0))
    return hit, tmin


def box_visibility(
    corners: np.ndarray, occluder_boxes: np.ndarray, calib: np.ndarray, origin=None
) -> float:
    """Fraction of a box's corners whose camera rays are not blocked by any
    occluder AABB (reference raycasting visibility use)."""
    origin = np.zeros(3) if origin is None else np.asarray(origin, np.float64)
    corners = np.asarray(corners, np.float64)
    dirs = corners - origin
    dists = np.linalg.norm(dirs, axis=1)
    dirs = dirs / np.maximum(dists[:, None], 1e-9)
    visible = np.ones(len(corners), bool)
    for box in np.asarray(occluder_boxes).reshape(-1, 2, 3):
        hit, tmin = ray_box_intersection(origin, dirs, box[0], box[1])
        visible &= ~(hit & (tmin < dists - 1e-6) & (tmin > 0))
    return float(visible.mean())
