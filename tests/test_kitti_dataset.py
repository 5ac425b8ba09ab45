"""KITTI dataset: synthetic tree, label encoding, and encode->decode
round-trip consistency (the reference validates this implicitly through
decode_batch, kitti.py:466-518)."""

import math
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    try:
        import cv2
    except ImportError:
        pytest.skip("cv2 required")
    root = tmp_path_factory.mktemp("kitti")
    (root / "training" / "image_2").mkdir(parents=True)
    (root / "training" / "label_2").mkdir(parents=True)
    (root / "training" / "calib").mkdir(parents=True)
    (root / "ImageSets").mkdir()
    rng = np.random.default_rng(0)
    P2 = "7.215377e+02 0.000000e+00 6.095593e+02 4.485728e+01 0.000000e+00 7.215377e+02 1.728540e+02 2.163791e-01 0.000000e+00 0.000000e+00 1.000000e+00 2.745884e-03"
    ids = []
    for i in range(4):
        img = (rng.uniform(0, 255, (375, 1242, 3))).astype(np.uint8)
        cv2.imwrite(str(root / "training" / "image_2" / f"{i:06d}.png"), img)
        lines = []
        for j in range(3):
            x = float(rng.uniform(-8, 8))
            z = float(rng.uniform(8, 40))
            y = 1.65
            h, w, l = 1.5, 1.65, 3.9
            ry = float(rng.uniform(-math.pi, math.pi))
            # project box center to get a plausible 2D box
            u = 721.5377 * x / z + 609.5593
            v = 721.5377 * (y - h / 2) / z + 172.854
            bw = 721.5377 * l / z
            bh = 721.5377 * h / z
            x1, y1 = max(u - bw / 2, 0), max(v - bh / 2, 0)
            x2, y2 = min(u + bw / 2, 1241), min(v + bh / 2, 374)
            if x2 - x1 < 10 or y2 - y1 < 10:
                continue
            alpha = ry - math.atan2(u - 609.5593, 721.5377)
            lines.append(
                f"Car 0.0 0 {alpha:.2f} {x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f} "
                f"{h:.2f} {w:.2f} {l:.2f} {x:.2f} {y:.2f} {z:.2f} {ry:.2f}"
            )
        (root / "training" / "label_2" / f"{i:06d}.txt").write_text("\n".join(lines) + "\n")
        (root / "training" / "calib" / f"{i:06d}.txt").write_text(
            f"P2: {P2}\nR0_rect: 1 0 0 0 1 0 0 0 1\nTr_velo_to_cam: 1 0 0 0 0 1 0 0 0 0 1 0\n"
        )
        ids.append(f"{i:06d}")
    (root / "ImageSets" / "train.txt").write_text("\n".join(ids) + "\n")
    (root / "ImageSets" / "val.txt").write_text("\n".join(ids) + "\n")
    return root


def test_kitti_dataset_batches(kitti_root):
    from yolov10_3d_tpu.data.kitti import KITTIDataset

    ds = KITTIDataset(kitti_root, split="val")
    assert len(ds) == 4
    item = ds[0]
    assert item["img"].shape == (384, 1280, 3)
    n = int(item["mask_gt"].sum())
    assert n >= 1
    assert item["gt_bboxes"][:n].min() >= 0 and item["gt_bboxes"][:n].max() <= 1
    assert (item["gt_depth"][:n] > 1).all()
    assert item["calib"].shape == (6,)
    # heading bins valid
    assert (item["gt_heading_bin"][:n] >= 0).all() and (item["gt_heading_bin"][:n] < 12).all()


def test_kitti_train_augment_runs(kitti_root):
    from yolov10_3d_tpu.data.kitti import KITTIDataset

    class Args:
        fliplr = 1.0
        random_crop = 1.0
        mixup = 0.5
        min_scale = 0.8
        max_scale = 1.2
        translate = 0.1
        seed = 0
        cam_dis = False
        min_depth_threshold = 1.0
        max_depth_threshold = 120.0

    ds = KITTIDataset(kitti_root, split="train", args=Args())
    for i in range(len(ds)):
        item = ds[i]
        assert item["img"].shape == (384, 1280, 3)


def test_encode_decode_roundtrip(kitti_root, tmp_path):
    """Feed GT values through decode_preds -> recovered location/ry must match
    the original label (inverse of the dataset encoding)."""
    from yolov10_3d_tpu.data.kitti import KITTIDataset
    from yolov10_3d_tpu.data.kitti_utils import get_objects_from_label

    ds = KITTIDataset(kitti_root, split="val")
    item = ds[0]
    n = int(item["mask_gt"].sum())
    # build fake "predictions" from GT encodings
    K = n
    preds = np.zeros((1, K, 37), np.float32)
    for j in range(n):
        cxcywh = item["gt_bboxes"][j] * np.array([1280, 384, 1280, 384])
        xyxy = np.concatenate([cxcywh[:2] - cxcywh[2:] / 2, cxcywh[:2] + cxcywh[2:] / 2])
        preds[0, j, :4] = xyxy
        preds[0, j, 4:6] = item["gt_center_3d"][j]
        preds[0, j, 6:9] = item["gt_size_3d"][j]
        hbin = int(item["gt_heading_bin"][j])
        preds[0, j, 9 + hbin] = 10.0  # bin logits
        preds[0, j, 21 + hbin] = item["gt_heading_res"][j]
        preds[0, j, 33] = item["gt_depth"][j]
        preds[0, j, 34] = 0.0  # dep_un -> sigma=1
        preds[0, j, 35] = 8.0  # high score logit
        preds[0, j, 36] = item["gt_labels"][j]

    calib = ds.get_calib(int(item["img_id"]))
    results = ds.decode_preds(
        preds, [calib], ["000000.txt"], item["trans_inv"][None], threshold=0.01
    )
    rows = results["000000.txt"]
    assert len(rows) == n
    objs = [o for o in get_objects_from_label(kitti_root / "training/label_2/000000.txt")]
    # match decoded rows to objects by location proximity
    for row in rows:
        loc = np.array(row[9:12])
        ry = row[12]
        best = min(objs, key=lambda o: np.linalg.norm(o.pos - loc))
        assert np.linalg.norm(best.pos - loc) < 0.3, (best.pos, loc)
        dry = abs(best.ry - ry)
        dry = min(dry, 2 * math.pi - dry)
        assert dry < 0.3, (best.ry, ry)


def test_kitti_val_e2e(kitti_root, tmp_path):
    """Full 3D val loop on an untrained yolov10n_3D — must produce finite
    metrics and write KITTI txt preds."""
    import jax
    import flax

    from yolov10_3d_tpu.data.dataset import DataLoader
    from yolov10_3d_tpu.data.kitti import KITTIDataset
    from yolov10_3d_tpu.engine.validator3d import Detection3DValidator
    from yolov10_3d_tpu.nn.build import build_model
    from yolov10_3d_tpu.nn.heads3d import detect3d_bias_init

    ds = KITTIDataset(kitti_root, split="val")
    model, spec = build_model("yolov10_3d_tpu/cfg/models/v10-3D/yolov10n_3D.yaml")
    import jax.numpy as jnp

    x0 = jnp.zeros((1, 384, 1280, 3))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False
    )
    params = flax.core.unfreeze(variables["params"])
    params[f"model_{spec.head_index}"] = detect3d_bias_init(
        params[f"model_{spec.head_index}"], spec.nc, spec.strides
    )
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False, num_threads=2)
    from types import SimpleNamespace

    validator = Detection3DValidator(model, spec, SimpleNamespace())
    out = validator(variables, ds, loader, save_dir=str(tmp_path))
    assert "metrics/3D" in out and np.isfinite(out["metrics/3D"])
    assert (tmp_path / "preds" / "000000.txt").exists()


def test_fixture_x_in_frame_boxes_unclipped(tmp_path):
    """x_in_frame=True must place every 2D box STRICTLY inside the frame —
    the near-z learn-proofs rely on unclipped apparent size (bw = f*l/z) as
    the depth signal; a clipped box breaks that proportionality silently."""
    try:
        import cv2  # noqa: F401
    except ImportError:
        pytest.skip("cv2 required")
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from _helpers import make_kitti_tree

    f = 721.5377
    yaml_path = make_kitti_tree(
        tmp_path / "k", n_images=6, draw_boxes=True, n_objects=3,
        z_range=(8.0, 15.0), x_in_frame=True,
    )
    n = 0
    for lbl in sorted((yaml_path.parent / "training" / "label_2").glob("*.txt")):
        for line in lbl.read_text().splitlines():
            p = line.split()
            x1, y1, x2, y2 = map(float, p[4:8])
            h, w, l, _, _, z = map(float, p[8:14])
            # strictly inside (the fixture clamps at 0/1241/374; equality
            # would mean a clip happened)
            assert 0.0 < x1 < x2 < 1241.0 and 0.0 < y1 < y2 < 374.0, line
            # unclipped width/height match the pinhole projection (0.3 px
            # absorbs the label file's 2-decimal rounding of x1/x2/z — a
            # real clip is tens of pixels)
            assert abs((x2 - x1) - f * l / z) < 0.3, line
            assert abs((y2 - y1) - f * h / z) < 0.3, line
            n += 1
    # overlap-skip + min-size filters drop some of the 18 candidates;
    # the narrowed near-z x-range must still leave a learnable set
    assert n >= 8, n
