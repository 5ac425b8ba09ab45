"""data/utils.py + utils/downloads.py + utils/patches.py coverage
(reference data/utils.py verify_image_label/polygon2mask/autosplit,
utils/downloads.py safe_download/unzip/zip, utils/patches.py imread)."""

import zipfile

import numpy as np
import pytest


def _make_img(path, size=(32, 24)):
    from PIL import Image

    Image.new("RGB", size, (10, 20, 30)).save(path)


def test_img2label_paths():
    from yolov10_3d_tpu.data.utils import img2label_paths

    out = img2label_paths(["/d/images/train/a.jpg", "/d/images/b.png"])
    assert out == ["/d/labels/train/a.txt", "/d/labels/b.txt"]


def test_verify_image_label(tmp_path):
    from yolov10_3d_tpu.data.utils import verify_image, verify_image_label

    img = tmp_path / "a.jpg"
    _make_img(img)
    assert verify_image(img)[0]
    assert not verify_image(tmp_path / "missing.jpg")[0]

    lbl = tmp_path / "a.txt"
    lbl.write_text("0 0.5 0.5 0.2 0.2\n1 0.3 0.3 0.1 0.1\n0 0.5 0.5 0.2 0.2\n")
    ok, msg, lb = verify_image_label(img, lbl, num_cls=2)
    assert ok and lb.shape == (2, 5) and "duplicate" in msg

    lbl.write_text("5 0.5 0.5 0.2 0.2\n")  # class out of range
    ok, msg, lb = verify_image_label(img, lbl, num_cls=2)
    assert not ok and "out of range" in msg

    lbl.write_text("0 1.5 0.5 0.2 0.2\n")  # non-normalized
    assert not verify_image_label(img, lbl, num_cls=2)[0]

    ok, msg, lb = verify_image_label(img, tmp_path / "none.txt", num_cls=2)
    assert ok and lb.shape == (0, 5)


def test_polygon2mask_and_overlap():
    from yolov10_3d_tpu.data.utils import (
        polygon2mask, polygons2masks, polygons2masks_overlap,
    )

    sq = [(2, 2), (12, 2), (12, 12), (2, 12)]
    m = polygon2mask((16, 16), sq)
    assert m[7, 7] == 1 and m[0, 0] == 0
    ms = polygons2masks((16, 16), [sq, [(0, 0), (4, 0), (4, 4), (0, 4)]])
    assert ms.shape == (2, 16, 16)
    overlap, order = polygons2masks_overlap(
        (16, 16), [[(0, 0), (4, 0), (4, 4), (0, 4)], sq]
    )
    assert overlap.max() == 2 and order[0] == 1  # bigger square drawn first


def test_check_cls_dataset_and_autosplit(tmp_path):
    from yolov10_3d_tpu.data.utils import autosplit, check_cls_dataset

    for split in ("train", "val"):
        for cls in ("cat", "dog"):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            _make_img(d / "x.jpg")
    data = check_cls_dataset(tmp_path)
    assert data["nc"] == 2 and data["names"][0] == "cat"
    assert data["train_images"] == 2

    img_dir = tmp_path / "pool" / "images"
    img_dir.mkdir(parents=True)
    for i in range(20):
        _make_img(img_dir / f"{i}.jpg")
    files = autosplit(img_dir, weights=(0.8, 0.2, 0.0), seed=0)
    lines = sum(len(open(f).readlines()) for f in files if __import__("os").path.exists(f))
    assert lines == 20


def test_downloads_local_and_zip(tmp_path):
    from yolov10_3d_tpu.utils.downloads import (
        check_disk_space, is_url, safe_download, unzip_file, zip_directory,
    )

    assert is_url("https://x.test/a.zip") and is_url("file:///tmp/a") and not is_url("plain")
    assert check_disk_space(tmp_path, required_gb=0.001)
    assert not check_disk_space(tmp_path, required_gb=10**6)

    src_dir = tmp_path / "bundle"
    (src_dir / "sub").mkdir(parents=True)
    (src_dir / "sub" / "a.txt").write_text("hello")
    z = zip_directory(src_dir)
    assert zipfile.ZipFile(z).namelist() == ["bundle/sub/a.txt"]

    out = unzip_file(z, path=str(tmp_path / "out"))
    assert (tmp_path / "out" / "bundle" / "sub" / "a.txt").read_text() == "hello"

    # zip-slip is refused
    evil = tmp_path / "evil.zip"
    with zipfile.ZipFile(evil, "w") as zf:
        zf.writestr("../../escape.txt", "bad")
    with pytest.raises(ValueError, match="unsafe"):
        unzip_file(evil, path=str(tmp_path / "out2"))

    # local-path + file:// "downloads"
    srcf = tmp_path / "weights.bin"
    srcf.write_bytes(b"x" * 100)
    got = safe_download(str(srcf), dir=str(tmp_path / "dl"))
    assert open(got, "rb").read() == b"x" * 100
    got2 = safe_download(f"file://{srcf}", dir=str(tmp_path / "dl2"))
    assert open(got2, "rb").read() == b"x" * 100


def test_attempt_download_asset_local_only(tmp_path, monkeypatch):
    from yolov10_3d_tpu.utils.downloads import attempt_download_asset

    monkeypatch.chdir(tmp_path)
    (tmp_path / "w.ckpt").write_bytes(b"z")
    assert attempt_download_asset("w.ckpt").endswith("w.ckpt")
    with pytest.raises(FileNotFoundError, match="offline"):
        attempt_download_asset("nope.ckpt")


def test_patches_imread_imwrite(tmp_path):
    from yolov10_3d_tpu.utils.patches import imread, imwrite

    arr = np.random.default_rng(0).integers(0, 255, (10, 12, 3), np.uint8)
    assert imwrite(tmp_path / "x.png", arr)
    back = imread(tmp_path / "x.png")
    np.testing.assert_array_equal(back, arr)
    gray = imread(tmp_path / "x.png", flags=0)
    assert gray.ndim == 2


def test_label_plots(tmp_path):
    from yolov10_3d_tpu.utils.plotting import (
        plot_labels, plot_labels_3D, plot_training_depth_dist,
    )

    rng = np.random.default_rng(0)
    boxes = rng.uniform(0.1, 0.9, (50, 4))
    cls = rng.integers(0, 3, 50)
    assert plot_labels(boxes, cls, names={0: "car"}, save_dir=str(tmp_path))
    assert plot_labels_3D(
        rng.uniform(5, 60, 50), rng.uniform(0.5, 4, (50, 3)), cls, save_dir=str(tmp_path)
    )
    assert plot_training_depth_dist(
        rng.uniform(5, 60, 50), rng.uniform(5, 60, 50), save_dir=str(tmp_path)
    )
