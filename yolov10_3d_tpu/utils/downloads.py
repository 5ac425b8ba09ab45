"""Download/archive utilities (reference: utils/downloads.py —
safe_download, unzip_file, zip_directory, check_disk_space,
attempt_download_asset). This environment has no network egress, so HTTP
paths are gated: local paths and file:// URLs always work, remote URLs
raise a clear error when the socket fails instead of hanging."""

from __future__ import annotations

import shutil
import zipfile
from pathlib import Path
from typing import Optional
from urllib.parse import urlparse


def is_url(url, check: bool = False) -> bool:
    """Syntactic URL check (reference downloads.py ``is_url``; check=True
    would HEAD the URL — skipped offline)."""
    try:
        r = urlparse(str(url))
        return bool(r.scheme in ("http", "https", "file") and r.netloc or r.scheme == "file")
    except Exception:
        return False


def check_disk_space(path=".", required_gb: float = 2.0, hard: bool = False) -> bool:
    """Free-space check (reference downloads.py ``check_disk_space``)."""
    free_gb = shutil.disk_usage(path).free / (1 << 30)
    ok = free_gb >= required_gb
    if not ok:
        msg = f"only {free_gb:.1f} GB free at {path}, {required_gb:.1f} GB required"
        if hard:
            raise OSError(msg)
        from . import LOGGER

        LOGGER.warning(msg)
    return ok


def unzip_file(file, path: Optional[str] = None, exclude=(".DS_Store", "__MACOSX")) -> str:
    """Path-safe unzip (reference downloads.py ``unzip_file``): refuses
    entries escaping the destination (zip-slip)."""
    from .checks import check_is_path_safe

    file = Path(file)
    dest = Path(path or file.parent)
    with zipfile.ZipFile(file) as zf:
        names = [n for n in zf.namelist() if not any(x in n for x in exclude)]
        # single top-level dir unzips in place; loose files get a subdir
        tops = {n.split("/")[0] for n in names}
        out = dest if len(tops) == 1 else dest / file.stem
        for n in names:
            target = out / n if len(tops) != 1 else dest / n
            if not check_is_path_safe(dest, target):
                raise ValueError(f"unsafe zip entry {n!r} escapes {dest}")
            zf.extract(n, out if len(tops) != 1 else dest)
    return str(out if len(tops) != 1 else dest / next(iter(tops)))


def zip_directory(directory, compress: bool = True, exclude=(".DS_Store", "__MACOSX")) -> str:
    """Zip a directory's contents (reference downloads.py ``zip_directory``)."""
    directory = Path(directory)
    out = directory.with_suffix(".zip")
    comp = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(out, "w", comp) as zf:
        for f in sorted(directory.rglob("*")):
            if f.is_file() and not any(x in str(f) for x in exclude):
                zf.write(f, f.relative_to(directory.parent))
    return str(out)


def safe_download(
    url,
    file: Optional[str] = None,
    dir: Optional[str] = None,
    unzip: bool = True,
    delete: bool = False,
    retry: int = 3,
    min_bytes: float = 1.0,
) -> str:
    """Fetch url to file (reference downloads.py ``safe_download``).

    Local paths and file:// URLs copy; http(s) URLs attempt urllib with
    retries and raise a clear ConnectionError in this egress-less
    environment instead of silently hanging."""
    url = str(url)
    parsed = urlparse(url)
    dest_dir = Path(dir or ".")
    dest_dir.mkdir(parents=True, exist_ok=True)
    name = file or Path(parsed.path or url).name
    dest = dest_dir / name

    if parsed.scheme in ("", "file"):
        src = Path(parsed.path if parsed.scheme == "file" else url)
        if not src.exists():
            raise FileNotFoundError(src)
        if src.resolve() != dest.resolve():
            shutil.copy2(src, dest)
    else:
        import urllib.error
        import urllib.request

        last = None
        for _ in range(max(retry, 1)):
            try:
                urllib.request.urlretrieve(url, dest)  # nosec - explicit user URL
                break
            except (urllib.error.URLError, OSError) as e:
                last = e
        else:
            raise ConnectionError(
                f"download failed after {retry} tries (no network egress?): {url}: {last}"
            )
    if dest.stat().st_size < min_bytes:
        dest.unlink(missing_ok=True)
        raise OSError(f"downloaded file {dest} smaller than {min_bytes} bytes")
    if unzip and dest.suffix == ".zip":
        out = unzip_file(dest)
        if delete:
            dest.unlink()
        return out
    return str(dest)


def attempt_download_asset(file, repo: str = "", release: str = "") -> str:
    """Resolve a weights asset locally (reference downloads.py
    ``attempt_download_asset`` resolves from GitHub releases; offline we
    search cwd + the local hub dir and raise with guidance otherwise)."""
    p = Path(str(file))
    if p.exists():
        return str(p)
    for root in (Path.cwd(), Path.home() / ".yolov10_3d_tpu" / "weights"):
        hit = next(iter(root.rglob(p.name)), None) if root.exists() else None
        if hit:
            return str(hit)
    raise FileNotFoundError(
        f"asset {file!r} not found locally and downloads are unavailable "
        "offline; place the file in the working directory or "
        "~/.yolov10_3d_tpu/weights/"
    )
