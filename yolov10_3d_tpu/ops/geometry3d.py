"""3D box geometry: projected-center + depth + size + heading -> 8 camera-frame
corners (reference: ultralytics/utils/keypoint_utils.py).

calib vectors are (..., 6) = [cu, cv, fu, fv, tx, ty] (KITTI P2 intrinsics with
the baseline terms, kitti_utils.py:178 ``Calibration``). All pure jnp, fp32.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

NUM_HEADING_BINS = 12


def class2angle(hbin: jax.Array, residual: jax.Array, num_bins: int = NUM_HEADING_BINS) -> jax.Array:
    """Heading bin index + residual -> alpha in (-pi, pi] (keypoint_utils.py:42)."""
    angle_per_class = 2 * math.pi / num_bins
    angle = hbin.astype(jnp.float32) * angle_per_class + residual
    return jnp.where(angle > math.pi, angle - 2 * math.pi, angle)


def angle2class(angle: jax.Array, num_bins: int = NUM_HEADING_BINS):
    """Continuous alpha -> (bin index, residual) (reference data/utils.py:672)."""
    angle = angle % (2 * math.pi)
    angle_per_class = 2 * math.pi / num_bins
    shifted = (angle + angle_per_class / 2) % (2 * math.pi)
    cls = (shifted / angle_per_class).astype(jnp.int32)
    residual = shifted - (cls.astype(jnp.float32) * angle_per_class + angle_per_class / 2)
    return cls, residual


def alpha2ry(alpha: jax.Array, xs: jax.Array, calibs: jax.Array) -> jax.Array:
    """Observation angle -> global yaw via the ray through x (keypoint_utils.py:94)."""
    cu = calibs[..., 0:1]
    fu = calibs[..., 2:3]
    if alpha.shape[-1] != 1:
        alpha = alpha[..., None]
    ry = alpha + jnp.arctan2(xs[..., None] - cu, fu)
    ry = jnp.where(ry > math.pi, ry - 2 * math.pi, ry)
    ry = jnp.where(ry < -math.pi, ry + 2 * math.pi, ry)
    return ry


def ry2alpha(ry: jax.Array, xs: jax.Array, calibs: jax.Array) -> jax.Array:
    cu = calibs[..., 0:1]
    fu = calibs[..., 2:3]
    if ry.shape[-1] != 1:
        ry = ry[..., None]
    alpha = ry - jnp.arctan2(xs[..., None] - cu, fu)
    alpha = jnp.where(alpha > math.pi, alpha - 2 * math.pi, alpha)
    alpha = jnp.where(alpha < -math.pi, alpha + 2 * math.pi, alpha)
    return alpha


def img_to_rect(center_2d: jax.Array, dep: jax.Array, calibs: jax.Array) -> jax.Array:
    """Backproject image points + depth into the rectified camera frame
    (keypoint_utils.py:113). center_2d (..., 2), dep (..., 1) -> (..., 3)."""
    cu, cv, fu, fv, tx, ty = (calibs[..., i : i + 1] for i in range(6))
    x = (center_2d[..., 0:1] - cu) * dep / fu + tx
    y = (center_2d[..., 1:2] - cv) * dep / fv + ty
    return jnp.concatenate([x, y, dep], axis=-1)


def rect_to_img(pts3d: jax.Array, calibs: jax.Array) -> jax.Array:
    """Project camera-frame points to the image (kitti_utils.py rect_to_img).
    pts3d (..., 3) -> (..., 2)."""
    cu, cv, fu, fv, tx, ty = (calibs[..., i : i + 1] for i in range(6))
    z = pts3d[..., 2:3]
    u = (pts3d[..., 0:1] - tx) * fu / z + cu
    v = (pts3d[..., 1:2] - ty) * fv / z + cv
    return jnp.concatenate([u, v], axis=-1)


def get_box_corners(size3d: jax.Array) -> jax.Array:
    """size3d (..., 3) = (h, w, l) -> (..., 8, 3) object-frame corners
    (keypoint_utils.py:20)."""
    hl = size3d[..., 2:3] / 2
    hw = size3d[..., 1:2] / 2
    hh = size3d[..., 0:1] / 2
    cx = jnp.concatenate([hl, hl, -hl, -hl, hl, hl, -hl, -hl], axis=-1)
    cy = jnp.concatenate([hw, -hw, hw, -hw, hw, -hw, hw, -hw], axis=-1)
    cz = jnp.concatenate([-hh, -hh, -hh, -hh, hh, hh, hh, hh], axis=-1)
    return jnp.stack([cx, cy, cz], axis=-1)


def _egoc_rot_mat(ry: jax.Array) -> jax.Array:
    """Egocentric rotation matrix: euler XYZ of (pi/2, -ry, 0)
    (keypoint_utils.py:87 ``to_egoc_rot_mat``). ry (..., 1) -> (..., 3, 3)."""
    ry = ry[..., 0]
    cos, sin = jnp.cos(-ry), jnp.sin(-ry)
    one, zero = jnp.ones_like(ry), jnp.zeros_like(ry)
    # Rx(pi/2) = [[1,0,0],[0,0,-1],[0,1,0]]
    rx = jnp.stack(
        [one, zero, zero, zero, zero, -one, zero, one, zero], -1
    ).reshape(ry.shape + (3, 3))
    rym = jnp.stack([cos, zero, sin, zero, one, zero, -sin, zero, cos], -1).reshape(
        ry.shape + (3, 3)
    )
    return jnp.matmul(rx, rym)


def transform_to_camera(corners: jax.Array, locations: jax.Array, ry: jax.Array) -> jax.Array:
    """Rotate object-frame corners and translate to camera frame
    (keypoint_utils.py:105). corners (..., 8, 3), locations (..., 3), ry (..., 1)."""
    rot = _egoc_rot_mat(ry)
    # reference einsum("bnji,bnkj->bnki"): out[..., k, i] = sum_j R[..., j, i] * C[..., k, j]
    out = jnp.einsum("...ji,...kj->...ki", rot, corners)
    return out + locations[..., None, :]


def get_roty(center_3d: jax.Array, heading_bin: jax.Array, heading_res: jax.Array, calibs: jax.Array) -> jax.Array:
    """(keypoint_utils.py:29) heading_bin: (..., 12) logits or (..., 1) index;
    heading_res: (..., 12) or (..., 1)."""
    if heading_bin.shape[-1] > 1:
        hbin = heading_bin.argmax(axis=-1)
    else:
        hbin = heading_bin[..., 0].astype(jnp.int32)
    if heading_res.shape[-1] > 1:
        onehot = jax.nn.one_hot(hbin, NUM_HEADING_BINS, dtype=heading_res.dtype)
        hres = (heading_res * onehot).sum(-1)
    else:
        hres = heading_res[..., 0]
    alpha = class2angle(hbin, hres)
    return alpha2ry(alpha, center_3d[..., 0], calibs)


def get_3d_keypoints(
    center_3d: jax.Array,   # (B, N, 2) projected 3D center, image pixels
    dep: jax.Array,         # (B, N, 1) depth in meters
    size3d: jax.Array,      # (B, N, 3) (h, w, l) meters
    heading_bin: jax.Array, # (B, N, 12) logits or (B, N, 1) index
    heading_res: jax.Array, # (B, N, 12) or (B, N, 1)
    calibs: jax.Array,      # (B, 6)
) -> jax.Array:
    """-> (B, N, 8, 3) camera-frame box corners (keypoint_utils.py:11)."""
    calibs = jnp.broadcast_to(calibs[:, None, :], center_3d.shape[:2] + (6,))
    locations = img_to_rect(center_3d, dep, calibs)
    corners = get_box_corners(size3d)
    ry = get_roty(center_3d, heading_bin, heading_res, calibs)
    return transform_to_camera(corners, locations, ry)
