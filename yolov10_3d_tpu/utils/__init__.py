"""Runtime base (reference: ultralytics/utils/__init__.py).

Provides the global LOGGER (:232-271), ``colorstr`` (:1025), yaml io helpers
(:318-390), the persistent ``SettingsManager`` (:906-1025), and the small
resilience decorators (``TryExcept``/``Retry``/``threaded``). No torch, no
platform probes beyond what the TPU build needs.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import threading
import time
from pathlib import Path
from typing import Any, Dict, Optional, Union

__all__ = (
    "LOGGER", "TQDM", "SETTINGS", "USER_CONFIG_DIR", "SettingsManager",
    "colorstr", "yaml_load", "yaml_save", "yaml_print", "TryExcept", "Retry",
    "threaded", "emojis",
)

RANK = int(os.getenv("RANK", -1))
VERBOSE = str(os.getenv("YOLO_VERBOSE", True)).lower() == "true"
LOGGING_NAME = "yolov10_3d_tpu"


def set_logging(name: str = LOGGING_NAME, verbose: bool = True) -> logging.Logger:
    """Stream logger with a plain message format (reference utils/__init__.py:232)."""
    level = logging.INFO if verbose and RANK in (-1, 0) else logging.ERROR
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("%(message)s"))
        handler.setLevel(level)
        logger.addHandler(handler)
        logger.propagate = False
    return logger


LOGGER = set_logging(verbose=VERBOSE)


def emojis(string: str = "") -> str:
    """Platform-safe emojis (reference :271) — pass-through outside Windows."""
    import platform

    return string.encode().decode("ascii", "ignore") if platform.system() == "Windows" else string


def colorstr(*input):
    """colorstr('blue', 'bold', 'hello world') (reference :1025)."""
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m",
        "yellow": "\033[33m", "blue": "\033[34m", "magenta": "\033[35m",
        "cyan": "\033[36m", "white": "\033[37m",
        "bright_black": "\033[90m", "bright_red": "\033[91m",
        "bright_green": "\033[92m", "bright_yellow": "\033[93m",
        "bright_blue": "\033[94m", "bright_magenta": "\033[95m",
        "bright_cyan": "\033[96m", "bright_white": "\033[97m",
        "end": "\033[0m", "bold": "\033[1m", "underline": "\033[4m",
    }
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]


def TQDM(iterable=None, **kwargs):
    """tqdm when available and verbose, plain iterable otherwise."""
    try:
        from tqdm import tqdm as _tqdm

        kwargs.setdefault("disable", not VERBOSE)
        kwargs.setdefault("bar_format", "{l_bar}{bar:10}{r_bar}")
        return _tqdm(iterable, **kwargs)
    except ImportError:  # pragma: no cover
        return iterable


# -- yaml io (reference :318-390) --
def yaml_save(file: Union[str, Path] = "data.yaml", data: Optional[Dict] = None, header: str = ""):
    import yaml

    file = Path(file)
    file.parent.mkdir(parents=True, exist_ok=True)
    data = {k: (str(v) if isinstance(v, Path) else v) for k, v in (data or {}).items()}
    with open(file, "w", errors="ignore", encoding="utf-8") as f:
        if header:
            f.write(header)
        yaml.safe_dump(data, f, sort_keys=False, allow_unicode=True)


def yaml_load(file: Union[str, Path], append_filename: bool = False) -> Dict:
    import yaml

    with open(file, errors="ignore", encoding="utf-8") as f:
        data = yaml.safe_load(f.read()) or {}
        if append_filename:
            data["yaml_file"] = str(file)
        return data


def yaml_print(yaml_file: Union[str, Path, Dict]):
    import yaml

    d = yaml_load(yaml_file) if isinstance(yaml_file, (str, Path)) else yaml_file
    LOGGER.info(f"Printing '{colorstr('bold', 'black', yaml_file)}'\n\n{yaml.dump(d, sort_keys=False, allow_unicode=True)}")


# -- resilience decorators (reference TryExcept :1052, Retry :1079, threaded :1108) --
class TryExcept(contextlib.ContextDecorator):
    def __init__(self, msg: str = "", verbose: bool = True):
        self.msg = msg
        self.verbose = verbose

    def __enter__(self):
        pass

    def __exit__(self, exc_type, value, traceback):
        if self.verbose and value:
            LOGGER.warning(f"{self.msg}{': ' if self.msg else ''}{value}")
        return True


class Retry(contextlib.ContextDecorator):
    """Retry a function ``times`` times with exponential backoff."""

    def __init__(self, times: int = 3, delay: float = 2.0):
        self.times = times
        self.delay = delay

    def __call__(self, func):
        def wrapped(*args, **kwargs):
            attempts = 0
            while attempts <= self.times:
                try:
                    return func(*args, **kwargs)
                except Exception as e:
                    attempts += 1
                    if attempts > self.times:
                        raise e
                    LOGGER.warning(f"Retry {attempts}/{self.times} failed: {e}")
                    time.sleep(self.delay * (2 ** (attempts - 1)))

        return wrapped


def threaded(func):
    """Run decorated function in a daemon thread; returns the Thread."""

    def wrapper(*args, **kwargs):
        t = threading.Thread(target=func, args=args, kwargs=kwargs, daemon=True)
        t.start()
        return t

    return wrapper


# -- persistent settings (reference SettingsManager :906-1025) --
def _user_config_dir(sub_dir: str = "yolov10_3d_tpu") -> Path:
    if env := os.getenv("YOLO_CONFIG_DIR"):
        return Path(env)
    home = Path.home()
    if os.name == "nt":  # pragma: no cover
        base = home / "AppData" / "Roaming"
    else:
        base = Path(os.getenv("XDG_CONFIG_HOME", home / ".config"))
    path = base / sub_dir
    if not _is_dir_writeable(base):
        path = Path("/tmp") / sub_dir  # fallback like reference GCP/Docker handling
    return path


def _is_dir_writeable(dir_path: Union[str, Path]) -> bool:
    return os.access(str(dir_path), os.W_OK) if Path(dir_path).exists() else True


USER_CONFIG_DIR = _user_config_dir()
SETTINGS_FILE = USER_CONFIG_DIR / "settings.json"


class SettingsManager(dict):
    """Persistent user settings with version sync (reference :906-1025).

    Keys mirror the reference where meaningful on TPU: dataset/weights/runs
    dirs, integration toggles. JSON on disk instead of yaml (atomic, typed).
    """

    def __init__(self, file: Union[str, Path] = SETTINGS_FILE, version: str = "0.2.0"):
        root = Path.cwd()
        self.file = Path(file)
        self.version = version
        self.defaults = {
            "settings_version": version,
            "datasets_dir": str(root / "datasets"),
            "weights_dir": str(root / "weights"),
            "runs_dir": str(root / "runs"),
            "sync": True,
            "tensorboard": True,
            "wandb": False,
            "mlflow": False,
            "comet": False,
            "dvc": False,
            "neptune": False,
            "clearml": False,
            "raytune": False,
            "hub": True,
        }
        super().__init__(self.defaults.copy())
        self._loading = True
        with contextlib.suppress(Exception):
            if self.file.exists():
                loaded = json.loads(self.file.read_text())
                correct_keys = set(loaded.keys()) == set(self.defaults.keys())
                correct_version = loaded.get("settings_version", "") == version
                if correct_keys and correct_version:
                    self.update(loaded)
                else:  # reset on schema drift (reference :975-989)
                    self.update({**self.defaults, **{k: v for k, v in loaded.items() if k in self.defaults}})
                    self["settings_version"] = version
                    self.save()
        self._loading = False

    def save(self):
        with contextlib.suppress(Exception):
            self.file.parent.mkdir(parents=True, exist_ok=True)
            self.file.write_text(json.dumps(dict(self), indent=2))

    def update(self, *args, **kwargs):
        super().update(*args, **kwargs)
        if not getattr(self, "_loading", False):
            self.save()  # persist on update like the reference (:1015)

    def reset(self):
        self.clear()
        self.update(self.defaults)
        self.save()


SETTINGS = SettingsManager()
