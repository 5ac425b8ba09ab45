"""Shared test helpers: cached model builds with jitted init."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from yolov10_3d_tpu.nn.build import build_model

CFG_DIR = "yolov10_3d_tpu/cfg/models/v10"


@functools.lru_cache(maxsize=None)
def _jitted_apply(model):
    return jax.jit(
        lambda v, x: model.apply(v, x, train=False), static_argnames=()
    )


def apply_model(model, variables, x):
    """Jitted eval-mode forward (eager flax apply is pathologically slow on CPU)."""
    return _jitted_apply(model)(variables, x)


def make_kitti_tree(
    root,
    n_images: int = 8,
    with_seg: bool = False,
    seed: int = 0,
    draw_boxes: bool = False,
    n_objects: int = 3,
    z_range=(8.0, 40.0),
    val_all: bool = False,
    x_in_frame: bool = False,
):
    """Synthetic KITTI tree: images + plausible Car labels + calib + split
    files; optional deepseg instance masks (pixel = label row index,
    background 51) for the FGDM depth-map path.

    draw_boxes=True paints each object as a filled rectangle with a
    per-instance color over the noise background, giving the net real
    visual signal (2D location + apparent size ~ 1/z) — required by the
    overfit-to-AP convergence tests; plain noise images are fine for the
    shape/finiteness smoke tests."""
    import math
    from pathlib import Path

    import cv2
    import numpy as np

    root = Path(root)
    (root / "training" / "image_2").mkdir(parents=True, exist_ok=True)
    (root / "training" / "label_2").mkdir(parents=True, exist_ok=True)
    (root / "training" / "calib").mkdir(parents=True, exist_ok=True)
    (root / "ImageSets").mkdir(exist_ok=True)
    if with_seg:
        (root / "deepseg" / "training" / "image_2").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    P2 = (
        "7.215377e+02 0.000000e+00 6.095593e+02 4.485728e+01 0.000000e+00 "
        "7.215377e+02 1.728540e+02 2.163791e-01 0.000000e+00 0.000000e+00 "
        "1.000000e+00 2.745884e-03"
    )
    ids = []
    for i in range(n_images):
        img = rng.uniform(0, 255, (375, 1242, 3)).astype(np.uint8)
        seg = np.full((375, 1242), 51, np.uint8)
        lines = []
        drawn = []
        for j in range(n_objects):
            z = float(rng.uniform(*z_range))
            y = 1.65
            h, w, l = 1.5, 1.65, 3.9
            if x_in_frame:
                # keep the WHOLE box inside the frame (near-z proofs: at
                # z<15, |x| up to 8 m projects mostly off-frame and clips)
                xmax = max((560.0 / 721.5377) * z - l / 2, 0.5)
                x = float(rng.uniform(-xmax, xmax))
            else:
                x = float(rng.uniform(-8, 8))
            ry = float(rng.uniform(-math.pi, math.pi))
            u = 721.5377 * x / z + 609.5593
            v = 721.5377 * (y - h / 2) / z + 172.854
            bw = 721.5377 * l / z
            bh = 721.5377 * h / z
            x1, y1 = max(u - bw / 2, 0), max(v - bh / 2, 0)
            x2, y2 = min(u + bw / 2, 1241), min(v + bh / 2, 374)
            if x2 - x1 < 10 or y2 - y1 < 10:
                continue
            if draw_boxes and any(
                x1 < px2 and px1 < x2 and y1 < py2 and py1 < y2
                for px1, py1, px2, py2 in drawn
            ):
                continue  # later rects overdraw earlier ones -> unlearnable GT
            drawn.append((x1, y1, x2, y2))
            if draw_boxes:
                # distinct, far-from-noise-mean color per instance so the
                # net can memorize per-instance attributes (ry, exact z)
                color = np.array(
                    [40 + 70 * j, 255 - 80 * j, (60 + 90 * i + 50 * j) % 256],
                    np.uint8,
                )
                img[int(y1) : int(y2), int(x1) : int(x2)] = color
            seg[int(y1) : int(y2), int(x1) : int(x2)] = len(lines)
            alpha = ry - math.atan2(u - 609.5593, 721.5377)
            lines.append(
                f"Car 0.0 0 {alpha:.2f} {x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f} "
                f"{h:.2f} {w:.2f} {l:.2f} {x:.2f} {y:.2f} {z:.2f} {ry:.2f}"
            )
        cv2.imwrite(str(root / "training" / "image_2" / f"{i:06d}.png"), img)
        (root / "training" / "label_2" / f"{i:06d}.txt").write_text("\n".join(lines) + "\n")
        (root / "training" / "calib" / f"{i:06d}.txt").write_text(
            f"P2: {P2}\nR0_rect: 1 0 0 0 1 0 0 0 1\nTr_velo_to_cam: 1 0 0 0 0 1 0 0 0 0 1 0\n"
        )
        if with_seg:
            cv2.imwrite(
                str(root / "deepseg" / "training" / "image_2" / f"{i:06d}_seg.png"), seg
            )
        ids.append(f"{i:06d}")
    (root / "ImageSets" / "train.txt").write_text("\n".join(ids) + "\n")
    val_ids = ids if val_all else ids[:4]
    (root / "ImageSets" / "val.txt").write_text("\n".join(val_ids) + "\n")
    yaml_path = root / "kitti_mini.yaml"
    yaml_path.write_text(
        f"path: {root}\ntrain: ImageSets/train.txt\nval: ImageSets/val.txt\n"
        "names:\n  0: Car\n  1: Pedestrian\n  2: Cyclist\n"
    )
    return yaml_path


def make_overfit2d_tree(root, n_images=8):
    """n_images images, two solid non-overlapping rectangles each; val ==
    train. (Shared by the overfit-to-AP proof and the cross-framework
    convergence campaign — both must consume literally the same files.)"""
    from pathlib import Path

    import cv2
    import numpy as np

    root = Path(root)
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n_images):
            # val == train: same per-index seed produces identical images
            r = np.random.default_rng(i)
            img = np.full((96, 96, 3), 30, np.uint8)
            lines = []
            for x0, x1lim in ((2, 44), (50, 92)):  # disjoint horizontal cells
                c = int(r.integers(0, 2))
                w = min(int(r.integers(24, 40)), x1lim - x0)
                h = int(r.integers(24, 44))
                x1 = x0 + int(r.integers(0, max(x1lim - x0 - w, 1)))
                y1 = int(r.integers(2, 96 - h - 2))
                color = (220, 40, 40) if c == 0 else (40, 220, 40)
                img[y1 : y1 + h, x1 : x1 + w] = color
                lines.append(
                    f"{c} {(x1 + w / 2) / 96:.6f} {(y1 + h / 2) / 96:.6f} "
                    f"{w / 96:.6f} {h / 96:.6f}"
                )
            cv2.imwrite(str(root / "images" / split / f"{i}.jpg"), img[..., ::-1])
            (root / "labels" / split / f"{i}.txt").write_text("\n".join(lines))
    yaml_path = root / "data.yaml"
    yaml_path.write_text(
        f"path: {root}\ntrain: images/train\nval: images/val\n"
        "names:\n  0: red\n  1: green\n"
    )
    return yaml_path


def _paint_objects(img, rng, j_base, f, cx, cy, z_range, n_objects, native_w, native_h):
    """Draw per-instance solid-color 'cars' (apparent size ~ 1/z) with
    non-overlapping 2D boxes; returns [(x, y, z, ry, box2d xyxy), ...].
    Same learnability construction as make_kitti_tree(draw_boxes=True)."""
    import math

    objs, drawn = [], []
    h3, w3, l3 = 1.8, 2.1, 4.8
    cells = np.linspace(0.15, 0.85, n_objects + 1)
    for j in range(n_objects):
        z = float(rng.uniform(*z_range))
        u = float(rng.uniform(cells[j] + 0.02, cells[j + 1] - 0.02)) * native_w
        x = (u - cx) * z / f
        y = 1.5  # KITTI convention: pos is the bottom-center
        v = f * (y - h3 / 2) / z + cy
        bw, bh = f * l3 / z, f * h3 / z
        x1, y1 = max(u - bw / 2, 0), max(v - bh / 2, 0)
        x2, y2 = min(u + bw / 2, native_w - 1), min(v + bh / 2, native_h - 1)
        if x2 - x1 < 12 or y2 - y1 < 12:
            continue
        if any(x1 < px2 and px1 < x2 and y1 < py2 and py1 < y2
               for px1, py1, px2, py2 in drawn):
            continue
        drawn.append((x1, y1, x2, y2))
        color = np.array(
            [40 + 70 * j, 255 - 80 * j, (60 + 90 * j_base + 50 * j) % 256],
            np.uint8,
        )
        img[int(y1) : int(y2), int(x1) : int(x2)] = color
        ry = float(rng.uniform(-math.pi, math.pi))
        objs.append((x, y, z, ry, (x1, y1, x2, y2)))
    return objs


def make_waymo_tree(root, n_images=8, n_objects=2, z_range=(8.0, 16.0)):
    """Learnable synthetic Waymo-JSON tree (WaymoDataset schema: COCO-like
    images+annotations, per-image calib P2). val == train."""
    import json
    from pathlib import Path

    import cv2

    root = Path(root)
    (root / "images").mkdir(parents=True)
    W, H, f = 960, 640, 1000.0
    P2 = [[f, 0.0, W / 2, 0.0], [0.0, f, H / 2, 0.0], [0.0, 0.0, 1.0, 0.0]]
    images, annotations = [], []
    aid = 0
    for i in range(n_images):
        rng = np.random.default_rng(100 + i)
        img = np.full((H, W, 3), 30, np.uint8)
        for x, y, z, ry, box in _paint_objects(
            img, rng, i, f, W / 2, H / 2, z_range, n_objects, W, H
        ):
            x1, y1, x2, y2 = box
            annotations.append({
                "id": aid, "image_id": i, "category_id": 1,  # Car
                "bbox": [x1, y1, x2 - x1, y2 - y1],
                "translation": [x, y, z],
                "dim": [1.8, 2.1, 4.8],  # h, w, l
                "rotation_y": ry,
                "num_lidar": 50,
            })
            aid += 1
        cv2.imwrite(str(root / "images" / f"{i}.jpg"), img[..., ::-1])
        images.append({"id": i, "file_name": f"images/{i}.jpg", "calib": P2})
    payload = json.dumps({"images": images, "annotations": annotations})
    (root / "train.json").write_text(payload)
    (root / "val.json").write_text(payload)
    yaml_path = root / "waymo_mini.yaml"
    yaml_path.write_text(
        f"path: {root}\ntrain: train.json\nval: val.json\n"
        "names:\n  0: Car\n  1: Pedestrian\n  2: Cyclist\n"
    )
    return yaml_path


def make_omni_tree(root, n_images=8, n_objects=2, z_range=(8.0, 16.0)):
    """Learnable synthetic Omni3D-JSON tree (Omni3Dataset schema: K intrinsics,
    bbox2D_proj, center_cam + R_cam, quality-filter fields). val == train."""
    import json
    import math
    from pathlib import Path

    import cv2

    root = Path(root)
    (root / "images").mkdir(parents=True)
    W, H, f = 960, 640, 1000.0
    K = [[f, 0.0, W / 2], [0.0, f, H / 2], [0.0, 0.0, 1.0]]
    images, annotations = [], []
    for i in range(n_images):
        rng = np.random.default_rng(200 + i)
        img = np.full((H, W, 3), 30, np.uint8)
        for x, y, z, ry, box in _paint_objects(
            img, rng, i, f, W / 2, H / 2, z_range, n_objects, W, H
        ):
            c, s = math.cos(ry), math.sin(ry)
            annotations.append({
                "image_id": i, "category_id": 1,
                "bbox2D_proj": list(box),
                "dimensions": [2.1, 1.8, 4.8],  # w, h, l
                "center_cam": [x, y - 1.8 / 2, z],  # pos = center + h/2
                "R_cam": [[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]],
                "lidar_pts": 50, "behind_camera": False, "visibility": 0.9,
                "truncation": 0.0, "segmentation_pts": 40, "depth_error": 0.05,
                "valid3D": True,
            })
        cv2.imwrite(str(root / "images" / f"{i}.jpg"), img[..., ::-1])
        images.append({"id": i, "file_path": f"images/{i}.jpg", "K": K})
    cats = [{"id": 1, "name": "car"}]
    payload = json.dumps(
        {"images": images, "annotations": annotations, "categories": cats}
    )
    (root / "train.json").write_text(payload)
    (root / "val.json").write_text(payload)
    yaml_path = root / "omni_mini.yaml"
    yaml_path.write_text(
        f"path: {root}\ntrain: train.json\nval: val.json\n"
        "names:\n  0: Car\n  1: Pedestrian\n  2: Cyclist\n"
    )
    return yaml_path


@functools.lru_cache(maxsize=None)
def build_jax(scale: str, h: int = 64, w: int = 64):
    """Build flax model + init variables (jitted init, cached per scale)."""
    path = (
        f"{CFG_DIR}/yolov10{scale}.yaml"
        if "3D" not in scale
        else f"yolov10_3d_tpu/cfg/models/v10-3D/yolov10{scale}.yaml"
    )
    model, spec = build_model(path)
    x = jnp.zeros((1, h, w, 3))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False
    )
    return model, spec, variables
