"""The real-data parity recipe (tools/parity_run.py) executes end-to-end on
synthetic stand-ins — so only real weights/data are missing when they land
(VERDICT r2 item #9)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from test_task_training import _det_tree, _train, _yaml


def test_parity_run_coco_mode(tmp_path):
    split = _det_tree(tmp_path, lambda i: "0 0.5 0.5 0.4 0.4\n1 0.3 0.3 0.2 0.2\n")
    data = _yaml(tmp_path, split)
    _train("yolov10n.yaml", data, tmp_path)
    ckpt = tmp_path / "run" / "weights" / "best.ckpt"

    import parity_run

    res = parity_run.main([
        "coco", "--weights", str(ckpt), "--data", data,
        "--imgsz", "64", "--batch", "2",
        "--save-dir", str(tmp_path / "parity"),
    ])
    assert "fitness" in res and np.isfinite(res["fitness"])


def test_kitti_txt_diff(tmp_path):
    """The txt differ: parity on identical dirs, drift detected on perturbed."""
    import parity_run

    a = tmp_path / "ours"
    b = tmp_path / "ref"
    a.mkdir()
    b.mkdir()
    row = ("Car 0.0 0 -1.57 100.0 120.0 200.0 180.0 "
           "1.50 1.65 3.90 1.00 1.60 20.00 -1.50 0.90\n")
    (a / "000001.txt").write_text(row)
    (b / "000001.txt").write_text(row)
    assert parity_run.diff_kitti_txt(a, b) == 0

    drifted = row.replace("20.00", "22.00")
    (b / "000001.txt").write_text(drifted)
    assert parity_run.diff_kitti_txt(a, b) == 1


def test_parity_run_export_pt(tmp_path):
    """Reverse direction: our trained ckpt -> reference-loadable .pt."""
    import pytest

    torch = pytest.importorskip("torch")
    split = _det_tree(tmp_path, lambda i: "0 0.5 0.5 0.4 0.4\n")
    data = _yaml(tmp_path, split)
    _train("yolov10n.yaml", data, tmp_path)
    ckpt = tmp_path / "run" / "weights" / "best.ckpt"

    import parity_run

    out = tmp_path / "reverse.pt"
    res = parity_run.main(["export-pt", "--weights", str(ckpt), "--out", str(out)])
    assert Path(res["out"]).exists()
    payload = torch.load(res["out"], map_location="cpu", weights_only=False)
    sd = payload["state_dict"]
    # dotted reference-style keys incl. BN stats and the frozen DFL arange
    assert any(k.endswith(".bn.running_mean") for k in sd)
    assert any(k.endswith(".dfl.conv.weight") for k in sd)
    assert all("_" not in k.split(".")[0] or k.startswith("model") for k in sd)
