"""`yolo10` CLI (reference: cfg/__init__.py:444 ``entrypoint``).

Grammar: ``yolo10 TASK MODE key=value ...`` with TASK in {detect, detect3d,
segment, classify, pose, obb} and MODE in {train, val, predict, export,
benchmark}; both optional, inferred like the reference (the head module in
the model YAML decides the real pipeline — the TASK word is a hint).
Special commands: help, version, cfg, explorer, serve.
"""

from __future__ import annotations

import ast
import sys
from typing import Any, Dict, List

TASKS = {"detect", "detect3d", "segment", "classify", "pose", "obb"}
MODES = {"train", "val", "predict", "export", "track", "benchmark"}

HELP = """yolo10 TASK MODE key=value ...

  TASK: detect | detect3d | segment | classify | pose | obb
        (optional, inferred from the model's head)
  MODE: train | val | predict | export | benchmark

examples:
  yolo10 predict model=yolov10n.ckpt source=img.jpg conf=0.25
  yolo10 train model=yolov10s.yaml data=coco128.yaml epochs=100 imgsz=640
  yolo10 detect3d train model=yolov10s_3D.yaml data=kitti.yaml
  yolo10 export model=yolov10s.ckpt format=stablehlo
  yolo10 explorer data=coco128.yaml  # dataset dashboard (HTTP)
  yolo10 serve model=yolov10s.ckpt port=8000 batch=32  # batching HTTP server
  yolo10 cfg                      # print default config
"""


def parse_kv(args: List[str]) -> Dict[str, Any]:
    out = {}
    for a in args:
        if "=" not in a:
            raise SystemExit(f"expected key=value, got {a!r}\n\n{HELP}")
        k, v = a.split("=", 1)
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def entrypoint(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("help", "-h", "--help"):
        print(HELP)
        return 0
    if argv[0] == "version":
        from yolov10_3d_tpu import __version__

        print(__version__)
        return 0
    if argv[0] == "cfg":
        from . import DEFAULT_CFG_PATH

        print(DEFAULT_CFG_PATH.read_text())
        return 0
    if argv[0] == "explorer":
        # `yolo explorer` launches the dataset dashboard (reference
        # cfg/__init__.py:414 handle_explorer runs the streamlit dash; ours
        # is the stdlib-HTTP ExplorerDashboard).
        kv = parse_kv(argv[1:])
        data = kv.pop("data", None)
        if data is None:
            raise SystemExit("explorer requires data=<images dir or dataset yaml>")
        from ..data.explorer import Explorer
        from ..data.explorer_dash import ExplorerDashboard
        from ..engine.model import YOLO

        model = YOLO(str(kv.pop("model", "yolov10n.yaml")))
        ex = Explorer(data, model=model, imgsz=int(kv.pop("imgsz", 256)))
        n = ex.create_embeddings_table()
        print(f"embedded {n} images")
        ExplorerDashboard(ex, names=getattr(model, "names", None)).serve(
            port=int(kv.pop("port", 7861))
        )
        return 0
    if argv[0] == "serve":
        # dynamic-batching inference server (engine/server.py) — the TPU
        # deployment surface the reference's Gradio demo / HUB deploy covers
        kv = parse_kv(argv[1:])
        platform = kv.pop("platform", None)
        if platform:  # e.g. platform=cpu for local testing — on this image
            # the env var is pre-empted by the site-installed TPU plugin,
            # so only the pre-init config flag selects the backend
            import jax

            jax.config.update("jax_platforms", str(platform))
        from ..engine.model import YOLO
        from ..engine.server import InferenceServer

        model = YOLO(str(kv.pop("model", "yolov10n.yaml")))
        srv = InferenceServer(
            model,
            imgsz=kv.pop("imgsz", 640),
            conf=float(kv.pop("conf", 0.25)),
            max_batch=int(kv.pop("batch", 32)),
            max_delay_ms=float(kv.pop("max_delay_ms", 10.0)),
            devices=int(kv.pop("devices", 1)),  # 0 = all local devices (dp)
        )
        srv.serve(
            host=str(kv.pop("host", "127.0.0.1")),
            port=int(kv.pop("port", 8000)),
        )
        return 0

    task = None
    mode = None
    rest = []
    for a in argv:
        if a in TASKS and task is None:
            task = a
        elif a in MODES and mode is None:
            mode = a
        else:
            rest.append(a)
    kv = parse_kv(rest)
    mode = mode or str(kv.get("mode", "predict"))
    model_name = str(kv.pop("model", "yolov10n.yaml"))
    if task is None and "3d" in model_name.lower():
        task = "detect3d"

    from ..engine.model import YOLO

    model = YOLO(model_name, task=task)
    if mode == "predict":
        source = kv.pop("source", None)
        if source is None:
            raise SystemExit("predict requires source=...")
        results = model.predict(source, **kv)
        for r in results:
            print(f"{r.path}: {len(r)} detections")
            for d in r.summary():
                # classify rows carry no 'box'; obb rows carry xywhr
                geom = d.get("box", "")
                print(f"  {d['name']} {d['confidence']:.3f} {geom}".rstrip())
        return 0
    if mode == "track":
        source = kv.pop("source", None)
        if source is None:
            raise SystemExit("track requires source=...")
        tracker = kv.pop("tracker", "bytetrack")
        for r in model.track(source, tracker=tracker, persist=True, **kv):
            n = len(r.boxes) if r.boxes is not None else 0
            print(f"{r.path}: {n} tracks")
        return 0
    if mode == "val":
        res = model.val(**kv)
        print({k: round(v, 5) for k, v in res.items() if isinstance(v, float)})
        return 0
    if mode == "train":
        # auto-resume when the run dir already has a last.ckpt (the fork's
        # SLURM-preemption recovery, reference cfg/__init__.py:537-542)
        from pathlib import Path

        save_dir = Path(str(kv.get("save_dir", "runs/train")))
        last = save_dir / "weights" / "last.ckpt"
        if "resume" not in kv and last.exists():
            print(f"resuming from existing checkpoint {last}")
            kv["resume"] = True
        model.train(**kv)
        return 0
    if mode == "export":
        out = model.export(**kv)
        print(f"exported -> {out}")
        return 0
    if mode == "benchmark":
        from ..utils.benchmarks import benchmark

        print(benchmark(model, **kv))
        return 0
    raise SystemExit(f"unknown mode {mode!r}\n\n{HELP}")


if __name__ == "__main__":
    raise SystemExit(entrypoint())
