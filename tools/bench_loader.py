#!/usr/bin/env python
"""Host data-loader throughput (VERDICT round-2 #8: prove the loader keeps
up with the ~2900 img/s chip).

Builds a synthetic on-disk JPEG dataset, then measures images/sec through
the full DataLoader pipeline in three modes:
  host-aug     — decode + mosaic4 + perspective + HSV + flip on the host
  device-aug   — decode + fixed-size uint8 tiles only (the jitted step does
                 mosaic/HSV/flip on the TPU; this is the serving-path design)
  eval         — decode + letterbox only
and with RAM caching on/off. Usage: python tools/bench_loader.py [n_imgs]
"""

import sys
import tempfile
import time
from pathlib import Path

import numpy as np


def make_dataset(root: Path, n: int = 256, hw=(480, 640)):
    from PIL import Image

    img_dir = root / "images"
    lbl_dir = root / "labels"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 255, (hw[0], hw[1], 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:05d}.jpg", quality=85)
        rows = [
            f"0 {rng.uniform(0.3, 0.7):.4f} {rng.uniform(0.3, 0.7):.4f} "
            f"{rng.uniform(0.1, 0.3):.4f} {rng.uniform(0.1, 0.3):.4f}"
            for _ in range(8)
        ]
        (lbl_dir / f"{i:05d}.txt").write_text("\n".join(rows) + "\n")
    return img_dir


def bench(img_dir: Path, *, augment: bool, device_aug: bool = False,
          cache=None, imgsz: int = 640, batch: int = 32, workers: int = 8,
          epochs: int = 2) -> float:
    from yolov10_3d_tpu.data.dataset import DataLoader, YOLODataset

    ds = YOLODataset(
        img_dir, imgsz=imgsz, augment=augment, cache=cache,
        device_aug=device_aug,
        hyp={"mosaic": 1.0, "mixup": 0.0, "fliplr": 0.5},
    )
    loader = DataLoader(ds, batch, shuffle=True, num_threads=workers)
    n = 0
    # first epoch warms caches; the second is the steady-state number
    for ep in range(epochs):
        if ep == epochs - 1:
            t0 = time.perf_counter()
            n = 0
        for b in loader:
            n += b["img"].shape[0] if "img" in b else b["tiles"].shape[0]
    return n / (time.perf_counter() - t0)


def main():
    import os

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cores = os.cpu_count() or 1
    # loader throughput scales ~linearly with host cores (the thread pool
    # saturates them once cv2's internal pool is pinned to 1); report
    # per-core numbers + the projection for a production v5e host (~24 vCPU)
    with tempfile.TemporaryDirectory() as td:
        img_dir = make_dataset(Path(td), n)
        rows = [
            ("eval (letterbox only)", dict(augment=False)),
            ("host-aug (mosaic+persp+hsv)", dict(augment=True)),
            ("host-aug + RAM cache", dict(augment=True, cache="ram")),
            ("device-aug tiles (uint8)", dict(augment=True, device_aug=True)),
        ]
        print(f"host cores: {cores}")
        for name, kw in rows:
            ips = bench(img_dir, **kw)
            per_core = ips / cores
            proj = per_core * 24
            verdict = "keeps up @24c" if proj >= 2900 else f"{proj / 2900:.2f}x of chip @24c"
            print(
                f"{name:32s}: {ips:6.0f} img/s ({per_core:5.0f}/core, "
                f"~{proj:5.0f} on a 24-vCPU v5e host -> {verdict})",
                flush=True,
            )


if __name__ == "__main__":
    main()
