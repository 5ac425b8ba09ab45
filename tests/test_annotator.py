"""auto_annotate: YOLO detections -> SAM box-prompt masks -> YOLO-seg labels."""

from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


class _FakeBoxes:
    def __init__(self, xyxy, cls):
        self.xyxy = xyxy
        self.cls = cls


class _FakeResult:
    def __init__(self, xyxy, cls):
        self.boxes = _FakeBoxes(np.asarray(xyxy, np.float32), np.asarray(cls))


class _FakeDetModel:
    """Returns one solid-rectangle detection regardless of the image."""

    def predict(self, path, conf=0.25):
        return [_FakeResult([[8.0, 8.0, 40.0, 40.0]], [1])]


def test_auto_annotate(tmp_path):
    import jax
    import jax.numpy as jnp

    from yolov10_3d_tpu.data.annotator import auto_annotate
    from yolov10_3d_tpu.models.sam import Sam, SAMPredictor

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    img = np.full((48, 64, 3), 30, np.uint8)
    img[8:40, 8:40] = 200
    cv2.imwrite(str(img_dir / "a.jpg"), img)

    model = Sam(embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,),
                img_size=64, prompt_embed_dim=32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           method=Sam.init_all)
    )()
    predictor = SAMPredictor(model, variables)

    out = auto_annotate(str(img_dir), _FakeDetModel(), predictor,
                        output_dir=str(tmp_path / "labels"))
    txt = (Path(out) / "a.txt").read_text().strip()
    if txt:  # untrained SAM may emit an arbitrary mask; format must hold
        parts = txt.split("\n")[0].split()
        assert parts[0] == "1"
        coords = np.asarray(list(map(float, parts[1:])))
        assert len(coords) % 2 == 0 and len(coords) >= 6
        assert coords.min() >= 0.0 and coords.max() <= 1.0
