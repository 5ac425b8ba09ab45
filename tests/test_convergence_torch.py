"""Cross-framework CONVERGENCE comparison + trained-weight round trip
(VERDICT r3 items #1b and #3).

The lockstep campaign (test_lockstep_torch.py) pins per-step semantics; this
file pins the INTEGRATED claim: training the torch reference and this
framework on literally the same 8 images with the same hyperparameters
reaches the same mAP50 — the closest offline approximation of BASELINE.md's
0.1-mAP north star — and a model trained in either framework can carry its
weights across through utils/torch_convert / utils/torch_export and keep its
validation metric.

The torch side drives the reference's own DetectionModel + v10DetectLoss +
optimizer-group/schedule/EMA semantics (trainer.py:734-786,636-644;
torch_utils.py:416) directly — the full reference BaseTrainer insists on
dataset downloads/AMP probes that are offline-gated, but every
numerics-bearing piece is the real reference code. Both frameworks consume
the SAME pixel batch (pulled once through our aug-off val loader) and are
evaluated by the SAME decode + DetMetrics pipeline, so the only free
variables are the frameworks themselves.
"""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# 900 epochs saturates BOTH frameworks at mAP50 0.995 on this set (round-4
# sweep: torch reaches 0.995 at epoch 600, ours at 900; at 300 the endpoint
# is chaotic for both — torch measured 0.4975, ours 0.8475)
EPOCHS = int(os.environ.get("YOLO10_CONV_EPOCHS", "900"))
LR0, LRF, WD, MOM = 0.003, 0.2, 5e-4, 0.937
NC = 2


def _loader_batch(root):
    """The 8 overfit images exactly as our val pipeline feeds them.
    The loader emits uint8 (device-side normalization contract); normalize
    here once so the torch loop and the manual eval see identical floats."""
    from yolov10_3d_tpu.data.dataset import DataLoader, YOLODataset

    ds = YOLODataset(root / "images" / "val", imgsz=64, augment=False)
    loader = DataLoader(ds, 8, shuffle=False, drop_last=False)
    batch = dict(next(iter(loader)))
    batch["img"] = np.asarray(batch["img"], np.float32) / 255.0
    return batch


def _gt_arrays(batch):
    """Per-image (gt_xyxy_pixels, gt_cls) from the padded loader batch."""
    out = []
    for i in range(batch["img"].shape[0]):
        m = np.asarray(batch["mask_gt"][i])
        b = np.asarray(batch["gt_bboxes"][i])[m]  # xywhn
        xy, wh = b[:, :2] * 64, b[:, 2:] * 64
        out.append((
            np.concatenate([xy - wh / 2, xy + wh / 2], -1),
            np.asarray(batch["gt_labels"][i])[m],
        ))
    return out


def _map50_from_one2one(feats_nhwc, batch):
    """Shared eval pipeline: our NMS-free decode + DetMetrics."""
    from yolov10_3d_tpu.ops.postprocess import v10_detections
    from yolov10_3d_tpu.utils.metrics import DetMetrics

    det = v10_detections(
        [jnp.asarray(f) for f in feats_nhwc], (8, 16, 32), NC,
        max_det=30, conf=0.001,
    )
    boxes = np.asarray(det["boxes"])
    scores = np.asarray(det["scores"])
    labels = np.asarray(det["labels"])
    valid = np.asarray(det["valid"])
    m = DetMetrics(nc=NC)
    for i, (gb, gc) in enumerate(_gt_arrays(batch)):
        v = valid[i]
        m.process_batch(boxes[i][v], scores[i][v], labels[i][v], gb, gc)
    return m.results()["mAP50"]


def _torch_raw_forward(ref, imgs_nhwc):
    """Reference model raw {one2many, one2one} with running-stat BN (the
    validator's numerics): train-mode graph, BN modules in eval."""
    import torch

    ref.train()
    for mod in ref.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.eval()
    with torch.no_grad():
        preds = ref(torch.from_numpy(
            np.ascontiguousarray(np.asarray(imgs_nhwc, np.float32).transpose(0, 3, 1, 2))
        ))
    return [t.numpy().transpose(0, 2, 3, 1) for t in preds["one2one"]]


def _train_torch_reference(ref, batch, epochs):
    """Train the reference model on the single full batch with the reference's
    optimizer/schedule/EMA semantics (warmup 0, matching the jax run).
    Returns the EMA state_dict (what the reference validates with)."""
    import torch
    from types import SimpleNamespace

    from _oracle import load_reference

    load_reference()
    from ultralytics.utils.loss import v10DetectLoss

    from test_lockstep_torch import _torch_model_groups

    ref.train()
    ref.args = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
    loss_fn = v10DetectLoss(ref)

    g_decay, g_norm, g_bias = _torch_model_groups(ref)
    opt = torch.optim.AdamW(g_bias, lr=LR0, betas=(MOM, 0.999), weight_decay=0.0)
    opt.add_param_group({"params": g_decay, "weight_decay": WD})
    opt.add_param_group({"params": g_norm, "weight_decay": 0.0})
    lf = lambda e: (1 - e / epochs) * (1.0 - LRF) + LRF
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda=lf)

    x_t = torch.from_numpy(np.ascontiguousarray(
        np.asarray(batch["img"], np.float32).transpose(0, 3, 1, 2)
    ))
    rows = []
    for i in range(x_t.shape[0]):
        m = np.asarray(batch["mask_gt"][i])
        b = np.asarray(batch["gt_bboxes"][i])[m]
        c = np.asarray(batch["gt_labels"][i])[m]
        for bb, cc in zip(b, c):
            rows.append((i, cc, *bb))
    rows = np.asarray(rows, np.float32)
    batch_t = {
        "batch_idx": torch.from_numpy(rows[:, 0]),
        "cls": torch.from_numpy(rows[:, 1:2]),
        "bboxes": torch.from_numpy(rows[:, 2:]),
    }

    ema_sd = {k: v.detach().clone().float() for k, v in ref.state_dict().items()}
    for step in range(epochs):
        total, _ = loss_fn(ref(x_t), batch_t)
        opt.zero_grad()
        total.backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), max_norm=10.0)
        opt.step()
        sched.step()  # 1 batch per epoch
        d = 0.9999 * (1 - math.exp(-(step + 1) / 2000))
        msd = ref.state_dict()
        for k, v in ema_sd.items():
            if v.dtype.is_floating_point:
                v *= d
                v += (1 - d) * msd[k].detach().float()
    return {k: (v.numpy().copy() if hasattr(v, "numpy") else v) for k, v in ema_sd.items()}


@pytest.mark.slow
def test_convergence_and_roundtrip_2d(tmp_path_factory, tmp_path):
    import torch

    from _helpers import make_overfit2d_tree
    from _oracle import reference_model
    from yolov10_3d_tpu import YOLOv10
    from yolov10_3d_tpu.utils.torch_convert import convert_torch_state_dict
    from yolov10_3d_tpu.utils.torch_export import flax_to_torch_state_dict

    try:
        import cv2  # noqa: F401
    except ImportError:
        pytest.skip("cv2 required")

    yaml_path = make_overfit2d_tree(tmp_path_factory.mktemp("conv2d"))
    root = yaml_path.parent
    batch = _loader_batch(root)

    # ---- ours: the real facade train (same config as the overfit proof) ----
    model = YOLOv10("yolov10n.yaml")
    model.train(
        data=str(yaml_path), epochs=EPOCHS, imgsz=64, batch=8, workers=2,
        warmup_epochs=0.0, close_mosaic=0, mosaic=0.0, mixup=0.0, fliplr=0.0,
        hsv_h=0.0, hsv_s=0.0, hsv_v=0.0, scale=0.0, translate=0.0,
        patience=10000, amp=False, lr0=LR0, lrf=LRF, optimizer="AdamW",
        nbs=8, val_period=10**6, save_dir=str(tmp_path / "run"),
    )
    ours_val = model.val(data=str(yaml_path), imgsz=64, batch=8)["mAP50"]
    feats_ours = jax.jit(lambda v, x: model.model.apply(v, x, train=False))(
        model.variables, jnp.asarray(batch["img"], jnp.float32)
    )["one2one"]
    ours_map = _map50_from_one2one(feats_ours, batch)

    # ---- torch reference: same data, same hyperparameters ----
    torch.manual_seed(0)
    ref = reference_model("yolov10n", nc=NC)
    ema_sd = _train_torch_reference(ref, batch, EPOCHS)
    ref_eval = reference_model("yolov10n", nc=NC)
    ref_eval.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in ema_sd.items()}
    )
    torch_map = _map50_from_one2one(_torch_raw_forward(ref_eval, batch["img"]), batch)

    # ---- the convergence claim ----
    print(f"[convergence] torch mAP50 {torch_map:.4f}  ours {ours_map:.4f} "
          f"(facade val {ours_val:.4f})", flush=True)
    assert torch_map >= 0.9, f"reference failed to overfit: {torch_map}"
    assert ours_map >= 0.9, f"we failed to overfit: {ours_map} (val {ours_val})"
    assert abs(ours_map - torch_map) <= 0.1, (ours_map, torch_map)

    # ---- round trip A: OUR trained weights -> reference model ----
    sd_out = flax_to_torch_state_dict(model.variables)
    ref_rt = reference_model("yolov10n", nc=NC)
    missing, unexpected = ref_rt.load_state_dict(
        {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd_out.items()},
        strict=False,
    )
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in k for k in missing), missing
    feats_rt = _torch_raw_forward(ref_rt, batch["img"])
    for a, b in zip(feats_ours, feats_rt):
        np.testing.assert_allclose(
            np.asarray(a), b, rtol=1e-3, atol=1e-3 * float(np.abs(b).max()),
            err_msg="ours->torch trained-weight forward",
        )
    rt_map = _map50_from_one2one(feats_rt, batch)
    assert abs(rt_map - ours_map) <= 0.02, (rt_map, ours_map)

    # ---- round trip B: TORCH trained weights -> our model ----
    v_rt = convert_torch_state_dict(
        {k: v for k, v in ema_sd.items() if "dfl" not in k},
        jax.tree.map(np.copy, model.variables), strict=False,
    )
    feats_b = jax.jit(lambda v, x: model.model.apply(v, x, train=False))(
        v_rt, jnp.asarray(batch["img"], jnp.float32)
    )["one2one"]
    rt_b_map = _map50_from_one2one(feats_b, batch)
    assert abs(rt_b_map - torch_map) <= 0.02, (rt_b_map, torch_map)


def _torch_3d_batch(batch):
    """Padded KITTIDataset batch -> the reference DDDetectionLoss flat-row
    batch dict (the mapping pinned by tests/test_loss3d_parity.py)."""
    import torch

    rows = {k: [] for k in (
        "batch_idx", "cls", "bboxes", "center_2d", "size_2d", "center_3d",
        "size_3d", "depth", "heading_bin", "heading_res",
    )}
    B = batch["img"].shape[0]
    for i in range(B):
        m = np.asarray(batch["mask_gt"][i])
        n = int(m.sum())
        rows["batch_idx"].append(np.full(n, i, np.float32))
        rows["cls"].append(np.asarray(batch["gt_labels"][i])[m].astype(np.float32)[:, None])
        rows["bboxes"].append(np.asarray(batch["gt_bboxes"][i])[m])
        rows["center_2d"].append(np.asarray(batch["gt_center_2d"][i])[m])
        rows["size_2d"].append(np.asarray(batch["gt_size_2d"][i])[m])
        rows["center_3d"].append(np.asarray(batch["gt_center_3d"][i])[m])
        rows["size_3d"].append(np.asarray(batch["gt_size_3d"][i])[m])
        rows["depth"].append(np.asarray(batch["gt_depth"][i])[m])
        rows["heading_bin"].append(np.asarray(batch["gt_heading_bin"][i])[m])
        rows["heading_res"].append(np.asarray(batch["gt_heading_res"][i])[m])
    out = {k: torch.from_numpy(np.concatenate(v).astype(np.float32))
           for k, v in rows.items()}
    out["calib"] = torch.from_numpy(np.asarray(batch["calib"], np.float32))
    out["mean_sizes"] = torch.from_numpy(np.asarray(batch["mean_sizes"][0], np.float32))
    return out


def _train_torch_reference_3d(ref, batch, epochs, lr0=0.003, lrf=0.2):
    """Train the reference yolov10n-3D (model + DetectLoss3d + reference
    optimizer/schedule/EMA semantics) on one full synthetic-KITTI batch."""
    import torch
    from types import SimpleNamespace

    from _oracle import load_reference

    load_reference()
    from ultralytics.utils.loss import DetectLoss3d

    from test_lockstep_torch import _torch_model_groups
    from test_loss3d_parity import HYP

    ref.train()
    ref.args = SimpleNamespace(
        **HYP, fgdm_loss=False, fgdm_supervision=False, box=7.5, dfl=1.5
    )
    loss_fn = DetectLoss3d(ref)

    g_decay, g_norm, g_bias = _torch_model_groups(ref)
    opt = torch.optim.AdamW(g_bias, lr=lr0, betas=(MOM, 0.999), weight_decay=0.0)
    opt.add_param_group({"params": g_decay, "weight_decay": WD})
    opt.add_param_group({"params": g_norm, "weight_decay": 0.0})
    lf = lambda e: (1 - e / epochs) * (1.0 - lrf) + lrf
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda=lf)

    x_t = torch.from_numpy(np.ascontiguousarray(
        np.asarray(batch["img"], np.float32).transpose(0, 3, 1, 2) / 255.0
    ))
    batch_t = _torch_3d_batch(batch)
    ema_sd = {k: v.detach().clone().float() for k, v in ref.state_dict().items()}
    for step in range(epochs):
        total, _ = loss_fn(ref(x_t), batch_t)
        opt.zero_grad()
        total.backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), max_norm=10.0)
        opt.step()
        sched.step()
        d = 0.9999 * (1 - math.exp(-(step + 1) / 2000))
        msd = ref.state_dict()
        for k, v in ema_sd.items():
            if v.dtype.is_floating_point:
                v *= d
                v += (1 - d) * msd[k].detach().float()
    return {k: (v.numpy().copy() if hasattr(v, "numpy") else v)
            for k, v in ema_sd.items()}


def _ap3d_from_one2one(feats_nhwc, ds, vb, save_dir, nc=3):
    """ONE shared 3D eval pipeline for both frameworks: raw one2one maps
    (NHWC, either framework's forward) -> decode_detect3d ->
    v10_3d_postprocess -> KITTI txt -> AP40 3d@0.70 moderate (PERCENT).
    Mirrors Detection3DValidator's post-forward path so the only free
    variable between frameworks is the network forward itself."""
    from yolov10_3d_tpu.ops.postprocess import decode_detect3d, v10_3d_postprocess

    feats = [jnp.asarray(f) for f in feats_nhwc]
    preds = decode_detect3d(feats, (8, 16, 32), nc)
    reg, scores, labels = v10_3d_postprocess(preds, 50, nc)
    preds_np = np.concatenate(
        [np.asarray(reg), np.asarray(scores)[..., None],
         np.asarray(labels)[..., None].astype(np.float32)], -1,
    )
    img_ids = np.asarray(vb["img_id"]).reshape(-1)
    calibs = [ds.get_calib(int(i)) for i in img_ids]
    im_files = [f"{int(i):06d}.txt" for i in img_ids]
    results = ds.decode_preds(
        preds_np, calibs, im_files, np.asarray(vb["trans_inv"]), threshold=0.001
    )
    return float(ds.get_stats(results, save_dir))


@pytest.mark.slow
def test_convergence_3d_and_roundtrips(tmp_path_factory, tmp_path):
    """The 3D half of the cross-framework campaign, both directions
    (round-5: the former torch->ours-only floor test upgraded to the 2D
    test's structure): ours and the torch reference (model + DetectLoss3d +
    reference optimizer semantics) each train 300 one-batch epochs on the
    SAME synthetic KITTI batch; both trained nets and BOTH trained-weight
    round trips are evaluated by ONE shared decode+AP40 pipeline.

    Calibration at this exact config (tools/exp_conv3d_calib.py, round-5,
    seed 0): ours 24.79% / torch 20.77% / |ours-torch| 4.02; BOTH round
    trips land exactly on their source framework's AP (|delta| 0.00, forward
    maps within 1e-4), and torch's shared-pipeline AP equals its
    via-our-validator metrics/3D to the same 0.00. The 300-epoch endpoint is
    chaotic for both frameworks (round-4 sweep measured ours at 14.0 on the
    same config; spread ~14-28), so the cross-framework band is the chaos
    width; the round-trip bands are tight (pure conversion error)."""
    import torch

    try:
        import cv2  # noqa: F401
    except ImportError:
        pytest.skip("cv2 required")
    from _helpers import make_kitti_tree
    from _oracle import reference_model
    from yolov10_3d_tpu import YOLOv10_3D
    from yolov10_3d_tpu.data.kitti import KITTIDataset
    from yolov10_3d_tpu.data.dataset import DataLoader
    from yolov10_3d_tpu.utils.torch_convert import convert_torch_state_dict
    from yolov10_3d_tpu.utils.torch_export import flax_to_torch_state_dict

    epochs = int(os.environ.get("YOLO10_CONV3D_EPOCHS", "300"))
    res_wh = [320, 96]
    yaml_path = make_kitti_tree(
        tmp_path_factory.mktemp("conv3d"), n_images=8, draw_boxes=True,
        val_all=True, z_range=(8.0, 25.0), n_objects=2,
    )

    class A:  # the aug-off args the overfit proof trains with
        kitti_resolution = res_wh
        fliplr = 0.0
        random_crop = 0.0
        mixup = 0.0
        max_depth_threshold = 60.0

    ds = KITTIDataset(root=yaml_path.parent, split="train", args=A())
    batch = next(iter(DataLoader(ds, 8, shuffle=False, drop_last=False)))
    ds_val = KITTIDataset(root=yaml_path.parent, split="val", args=A())
    vb = next(iter(DataLoader(ds_val, 8, shuffle=False, drop_last=False)))
    img_f = jnp.asarray(np.asarray(vb["img"], np.float32) / 255.0)

    # ---- ours: the real facade train (the overfit-proof config) ----
    ours = YOLOv10_3D("yolov10n_3D.yaml")
    ours.train(
        data=str(yaml_path), epochs=epochs, batch=8, imgsz=res_wh,
        kitti_resolution=res_wh, workers=2, warmup_epochs=0.0, fliplr=0.0,
        random_crop=0.0, mixup=0.0, patience=10000, amp=False, lr0=0.003,
        lrf=0.2, optimizer="AdamW", nbs=8, val_period=10**6,
        max_depth_threshold=60.0, save_dir=str(tmp_path / "run"),
    )
    feats_ours = jax.jit(lambda v, x: ours.model.apply(v, x, train=False))(
        ours.variables, img_f
    )["one2one"]
    ap_ours = _ap3d_from_one2one(feats_ours, ds_val, vb, str(tmp_path / "sh_ours"))

    # ---- torch reference: same data, same hyperparameters ----
    torch.manual_seed(0)
    ref = reference_model("yolov10n_3D")
    ema_sd = _train_torch_reference_3d(ref, batch, epochs)
    ref_eval = reference_model("yolov10n_3D")
    ref_eval.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in ema_sd.items()}
    )
    feats_torch = _torch_raw_forward(ref_eval, np.asarray(vb["img"], np.float32) / 255.0)
    ap_torch = _ap3d_from_one2one(feats_torch, ds_val, vb, str(tmp_path / "sh_t"))

    print(f"[convergence3d] shared-pipeline AP40-3D: ours {ap_ours:.2f}% "
          f"torch {ap_torch:.2f}%", flush=True)
    # Both frameworks LEARN real 3D (strict 3d@0.70 moderate; 0 until
    # ~epoch 150-200 in this fixture — round-4 calibration) ...
    assert ap_ours >= 7.0, (ap_ours, ap_torch)   # half the measured 14.0
    assert ap_torch >= 7.0, (ap_ours, ap_torch)
    # ... and land in the same band. The 300-epoch endpoint is chaotic for
    # both (round-4: 2D needed 900 epochs to saturate; 3D spans ~14-28
    # across fixtures/epochs), so the band is the chaos width, not 0.1.
    assert abs(ap_ours - ap_torch) <= 15.0, (ap_ours, ap_torch)

    # ---- round trip A: OUR trained 3D weights -> reference model ----
    sd_out = flax_to_torch_state_dict(ours.variables)
    ref_rt = reference_model("yolov10n_3D")
    missing, unexpected = ref_rt.load_state_dict(
        {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd_out.items()},
        strict=False,
    )
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in k for k in missing), missing
    feats_rt = _torch_raw_forward(ref_rt, np.asarray(vb["img"], np.float32) / 255.0)
    for a, b in zip(feats_ours, feats_rt):
        np.testing.assert_allclose(
            np.asarray(a), b, rtol=1e-3, atol=1e-3 * float(np.abs(b).max()),
            err_msg="ours->torch trained-3D-weight forward",
        )
    ap_rt = _ap3d_from_one2one(feats_rt, ds_val, vb, str(tmp_path / "sh_rt"))
    assert abs(ap_rt - ap_ours) <= 1.0, (ap_rt, ap_ours)

    # ---- round trip B: TORCH trained weights -> our model + full validator
    m = YOLOv10_3D("yolov10n_3D.yaml")
    m.variables = convert_torch_state_dict(
        {k: v for k, v in ema_sd.items() if "dfl" not in k},
        jax.tree.map(np.copy, m.variables), strict=False,
    )
    res = m.val(
        data=str(yaml_path), batch=8, kitti_resolution=res_wh,
        save_dir=str(tmp_path / "val3d"),
    )
    print(f"[convergence3d] torch-trained via our validator: "
          f"mAP50 {res['mAP50']:.4f} AP40-3D {res['metrics/3D']:.2f}%", flush=True)
    assert res["mAP50"] >= 0.8, res
    assert abs(res["metrics/3D"] - ap_torch) <= 1.0, (res["metrics/3D"], ap_torch)
