"""File helpers (reference: utils/files.py — increment_path, get_latest_run)."""

from __future__ import annotations

import glob
import os
from contextlib import contextmanager
from pathlib import Path


def increment_path(path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """runs/exp -> runs/exp2, exp3... (reference files.py ``increment_path``)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        suffix = path.suffix
        stem = path.with_suffix("") if suffix else path
        for n in range(2, 9999):
            p = Path(f"{stem}{sep}{n}{suffix}")
            if not p.exists():
                path = p
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def get_latest_run(search_dir: str = ".") -> str:
    """Most recent last.ckpt under search_dir (for resume)."""
    paths = glob.glob(f"{search_dir}/**/last.ckpt", recursive=True)
    return max(paths, key=os.path.getctime) if paths else ""


@contextmanager
def working_directory(path):
    prev = Path.cwd()
    os.chdir(path)
    try:
        yield
    finally:
        os.chdir(prev)
