"""API-docs generator stays in sync with the package (tools/gen_api_docs.py)."""

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def test_gen_api_docs(tmp_path):
    sys.path.insert(0, str(ROOT / "tools"))
    try:
        import gen_api_docs
    finally:
        sys.path.pop(0)

    gen_api_docs.main(tmp_path)
    pages = list(tmp_path.rglob("*.md"))
    assert len(pages) > 60  # one page per module + index
    idx = (tmp_path / "index.md").read_text()
    assert "yolov10_3d_tpu.train.tal3d" in idx
    tal = (tmp_path / "train" / "tal3d.md").read_text()
    # real docstring content with a reference citation, not a stub
    assert "assign3d" in tal and "tal.py:" in tal
