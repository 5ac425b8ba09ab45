#!/usr/bin/env python
"""Calibrate the 3D cross-framework convergence band (round-5 verdict item
2): at the EXACT config of tests/test_convergence_torch.py's 3D test
(320x96, 8 images, z 8-25, 300 one-batch epochs, AdamW lr0 3e-3), measure

  (a) OUR framework's trained metrics/3D          (facade train -> val)
  (b) the torch reference's trained metrics/3D    (reference model + loss +
      optimizer semantics -> weights converted -> our validator)
  (c) the ours->torch 3D round trip: our trained weights ->
      flax_to_torch_state_dict -> reference YOLOv10_3DDetectionModel raw
      forward -> the SAME shared decode+eval pipeline.

All three APs flow through ONE pipeline (decode_detect3d + v10_3d_postprocess
+ KITTIDataset.decode_preds + kitti_eval AP40), so (a)-(b) is a pure
framework difference and (a)-(c) is pure weight-conversion error.

Usage: python tools/exp_conv3d_calib.py [epochs] [seed]
"""

import os
import sys
import tempfile
import time
from pathlib import Path
from types import SimpleNamespace

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 300
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 0
RES = [320, 96]


def ap3d_from_one2one(feats_nhwc, ds, vb, save_dir, nc):
    """Shared eval: raw one2one maps (NHWC, any framework) -> decode ->
    KITTI txt -> AP40 3d@0.70 moderate (the validator3d post-forward path)."""
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


def main():
    import torch

    from _helpers import make_kitti_tree
    from _oracle import reference_model
    import test_convergence_torch as tc
    from yolov10_3d_tpu import YOLOv10_3D
    from yolov10_3d_tpu.data.dataset import DataLoader
    from yolov10_3d_tpu.data.kitti import KITTIDataset
    from yolov10_3d_tpu.utils.torch_convert import convert_torch_state_dict
    from yolov10_3d_tpu.utils.torch_export import flax_to_torch_state_dict

    tmp = Path(tempfile.mkdtemp(prefix="conv3d_calib_"))
    yaml_path = make_kitti_tree(
        tmp / "kitti", n_images=8, draw_boxes=True, val_all=True,
        z_range=(8.0, 25.0), n_objects=2,
    )
    args = SimpleNamespace(
        kitti_resolution=RES, fliplr=0.0, random_crop=0.0, mixup=0.0,
        max_depth_threshold=60.0,
    )
    ds_tr = KITTIDataset(root=yaml_path.parent, split="train", args=args)
    batch = next(iter(DataLoader(ds_tr, 8, shuffle=False, drop_last=False)))
    ds_val = KITTIDataset(root=yaml_path.parent, split="val", args=args)
    vb = next(iter(DataLoader(ds_val, 8, shuffle=False, drop_last=False)))
    nc = 3

    # ---- (a) ours ----
    t0 = time.time()
    model = YOLOv10_3D("yolov10n_3D.yaml")
    model.train(
        data=str(yaml_path), epochs=EPOCHS, batch=8, imgsz=RES,
        kitti_resolution=RES, workers=2, warmup_epochs=0.0, fliplr=0.0,
        random_crop=0.0, mixup=0.0, patience=10000, amp=False, lr0=0.003,
        lrf=0.2, optimizer="AdamW", nbs=8, val_period=10**6,
        max_depth_threshold=60.0, seed=SEED, save_dir=str(tmp / "run"),
    )
    res = model.val(data=str(yaml_path), batch=8, kitti_resolution=RES,
                    save_dir=str(tmp / "val_ours"))
    img_f = jnp.asarray(np.asarray(vb["img"], np.float32) / 255.0)
    feats_ours = jax.jit(lambda v, x: model.model.apply(v, x, train=False))(
        model.variables, img_f
    )["one2one"]
    ap_ours = ap3d_from_one2one(feats_ours, ds_val, vb, str(tmp / "sh_ours"), nc)
    print(f"[a] ours: facade metrics/3D={res['metrics/3D']:.2f} "
          f"mAP50={res['mAP50']:.4f} shared-pipeline AP={ap_ours:.2f} "
          f"({time.time()-t0:.0f}s)", flush=True)

    # ---- (c) ours -> torch round trip ----
    sd_out = flax_to_torch_state_dict(model.variables)
    ref_rt = reference_model("yolov10n_3D")
    missing, unexpected = ref_rt.load_state_dict(
        {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd_out.items()},
        strict=False,
    )
    print(f"    roundtrip load: missing={len(missing)} unexpected={len(unexpected)}"
          f" {[m for m in missing if 'num_batches_tracked' not in m][:5]}"
          f" {list(unexpected)[:5]}", flush=True)
    feats_rt = tc._torch_raw_forward(ref_rt, np.asarray(vb["img"], np.float32) / 255.0)
    ap_rt = ap3d_from_one2one(feats_rt, ds_val, vb, str(tmp / "sh_rt"), nc)
    # forward-map agreement
    for a, b in zip(feats_ours, feats_rt):
        d = np.max(np.abs(np.asarray(a) - b))
        print(f"    map maxdiff {np.asarray(a).shape}: {d:.2e}", flush=True)
    print(f"[c] ours->torch shared-pipeline AP={ap_rt:.2f} "
          f"(|rt-ours|={abs(ap_rt-ap_ours):.2f})", flush=True)

    # ---- (b) torch reference trains on the same batch ----
    t0 = time.time()
    torch.manual_seed(SEED)
    ref = reference_model("yolov10n_3D")
    ema_sd = tc._train_torch_reference_3d(ref, batch, EPOCHS)
    ref_eval = reference_model("yolov10n_3D")
    ref_eval.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in ema_sd.items()}
    )
    feats_t = tc._torch_raw_forward(ref_eval, np.asarray(vb["img"], np.float32) / 255.0)
    ap_torch = ap3d_from_one2one(feats_t, ds_val, vb, str(tmp / "sh_torch"), nc)
    # and through our validator via weight conversion (the test's existing path)
    m2 = YOLOv10_3D("yolov10n_3D.yaml")
    m2.variables = convert_torch_state_dict(
        {k: v for k, v in ema_sd.items() if "dfl" not in k},
        jax.tree.map(np.copy, m2.variables), strict=False,
    )
    res_t = m2.val(data=str(yaml_path), batch=8, kitti_resolution=RES,
                   save_dir=str(tmp / "val_torch"))
    print(f"[b] torch: shared-pipeline AP={ap_torch:.2f} via-our-validator "
          f"metrics/3D={res_t['metrics/3D']:.2f} mAP50={res_t['mAP50']:.4f} "
          f"({time.time()-t0:.0f}s)", flush=True)

    print(f"SUMMARY epochs={EPOCHS} seed={SEED} ours={ap_ours:.2f} "
          f"torch={ap_torch:.2f} rt={ap_rt:.2f} "
          f"|ours-torch|={abs(ap_ours-ap_torch):.2f}", flush=True)


if __name__ == "__main__":
    main()
