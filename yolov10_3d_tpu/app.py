"""Web demo (reference: app.py — a Gradio image/video predictor).

Launches a Gradio UI when gradio is installed; otherwise falls back to a
simple CLI that annotates an image/video to disk (the same predict surface).
"""

from __future__ import annotations

import sys
from pathlib import Path


def build_demo(model_name: str = "yolov10n.yaml"):
    import gradio as gr

    from yolov10_3d_tpu import YOLO

    model = YOLO(model_name)

    def predict_image(image, conf, imgsz):
        results = model.predict(image, conf=float(conf), imgsz=int(imgsz))
        return results[0].plot()

    with gr.Blocks(title="yolov10-3d-tpu") as demo:
        gr.Markdown("## YOLOv10 (TPU) demo")
        with gr.Row():
            inp = gr.Image(type="numpy", label="input")
            out = gr.Image(type="numpy", label="detections")
        conf = gr.Slider(0.0, 1.0, value=0.25, label="confidence")
        imgsz = gr.Slider(320, 1280, value=640, step=32, label="image size")
        btn = gr.Button("detect")
        btn.click(predict_image, [inp, conf, imgsz], out)
    return demo


def annotate_file(model_name: str, source: str, out_path: str = "annotated.jpg", **kw):
    """Headless fallback: run predict and write the annotated image."""
    import cv2

    from yolov10_3d_tpu import YOLO

    model = YOLO(model_name)
    results = model.predict(source, **kw)
    img = results[0].plot()
    cv2.imwrite(out_path, img[..., ::-1])
    return out_path


if __name__ == "__main__":
    model_name = sys.argv[1] if len(sys.argv) > 1 else "yolov10n.yaml"
    try:
        build_demo(model_name).launch()
    except ImportError:
        if len(sys.argv) > 2:
            out = annotate_file(model_name, sys.argv[2])
            print(f"gradio not installed; annotated -> {out}")
        else:
            print("usage (headless): python -m yolov10_3d_tpu.app MODEL SOURCE")
