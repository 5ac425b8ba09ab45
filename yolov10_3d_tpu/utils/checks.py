"""Runtime checks (reference: utils/checks.py — check_imgsz, check_version,
check_amp)."""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple, Union


def check_imgsz(
    imgsz: Union[int, Sequence[int]], stride: int = 32, min_dim: int = 1, floor: int = 0
) -> Union[int, List[int]]:
    """Validate/round image size to a multiple of the max stride (reference
    checks.py ``check_imgsz``) — avoids raw XLA shape errors downstream."""
    if isinstance(imgsz, (int, float)):
        sizes = [int(imgsz)]
        scalar = True
    else:
        sizes = [int(v) for v in imgsz]
        scalar = False
    out = []
    for s in sizes:
        if s <= floor:
            raise ValueError(f"imgsz {imgsz} must be > {floor}")
        r = max(math.ceil(s / stride) * stride, floor)
        out.append(r)
    if out != sizes:
        import warnings

        warnings.warn(
            f"imgsz {sizes} not a multiple of stride {stride}; updated to {out}"
        )
    return out[0] if scalar else out


def check_version(current: str, minimum: str) -> bool:
    def parse(v):
        return tuple(int(x) for x in v.split(".")[:3] if x.isdigit())

    return parse(current) >= parse(minimum)


def check_amp() -> bool:
    """bf16 sanity on the current backend: a matmul in bf16 must stay finite
    and close to fp32 (the reference runs a YOLO forward compare; a matmul
    probe is the same signal without a model download, checks.py check_amp)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.standard_normal((64, 64)).astype(np.float32)
    b = rng.standard_normal((64, 64)).astype(np.float32)
    ref = a @ b
    out = np.asarray(
        jax.jit(lambda x, y: (x.astype(jnp.bfloat16) @ y.astype(jnp.bfloat16)).astype(jnp.float32))(
            jnp.asarray(a), jnp.asarray(b)
        )
    )
    return bool(np.isfinite(out).all() and np.abs(out - ref).max() < 2.0)


def parse_version(version: str = "0.0.0") -> Tuple[int, ...]:
    """'2.0.1+cpu' -> (2, 0, 1) (reference checks.py:87)."""
    import re

    return tuple(int(x) for x in re.findall(r"\d+", version)[:3]) or (0, 0, 0)


def is_ascii(s) -> bool:
    """True when the string is pure ASCII (reference checks.py:105)."""
    return all(ord(c) < 128 for c in str(s))


def check_python(minimum: str = "3.8.0") -> bool:
    """Current interpreter >= minimum (reference checks.py:325)."""
    import platform

    return parse_version(platform.python_version()) >= parse_version(minimum)


def check_requirements(requirements=(), exclude=(), install: bool = False) -> bool:
    """Importability check for the given requirement names (reference
    checks.py:339 pip-installs on failure; this environment is offline, so
    ``install`` is accepted for API parity but never attempted)."""
    import importlib.util
    import re

    if isinstance(requirements, str):
        requirements = [requirements]
    missing = []
    for r in requirements:
        name = re.split(r"[><=~!]", str(r))[0].strip().replace("-", "_")
        if name in exclude:
            continue
        if importlib.util.find_spec(name) is None:
            missing.append(name)
    if missing:
        from . import LOGGER

        LOGGER.warning(f"requirements not importable (offline, not installed): {missing}")
        return False
    return True


def check_suffix(file, suffix=".ckpt", msg: str = ""):
    """Raise unless the file has one of the allowed suffixes (reference
    checks.py:440)."""
    from pathlib import Path

    if isinstance(suffix, str):
        suffix = (suffix,)
    s = Path(str(file)).suffix.lower()
    if s and s not in suffix:
        raise ValueError(f"{msg}{file} acceptable suffix is {suffix}, not {s}")


def check_file(file, suffix="", hard: bool = True):
    """Resolve a file locally — cwd, package cfg tree — no downloads
    (reference checks.py:478 also searches+downloads)."""
    from pathlib import Path

    if suffix:
        check_suffix(file, suffix)
    p = Path(str(file))
    if p.exists():
        return str(p)
    pkg = Path(__file__).resolve().parents[1]
    matches = sorted((pkg / "cfg").rglob(p.name))
    if matches:
        return str(matches[0])
    if hard:
        raise FileNotFoundError(f"'{file}' does not exist")
    return str(file)


def check_yaml(file, suffix=(".yaml", ".yml"), hard: bool = True):
    """check_file restricted to YAML (reference checks.py:506)."""
    return check_file(file, suffix=suffix, hard=hard)


def check_is_path_safe(basedir, path) -> bool:
    """True when `path` resolves inside `basedir` (reference checks.py:511 —
    guards archive extraction traversal)."""
    from pathlib import Path

    base = Path(basedir).resolve()
    target = Path(path).resolve()
    return target.parts[: len(base.parts)] == base.parts


def check_imshow(warn: bool = False) -> bool:
    """Image display support — always False in this headless/TPU environment
    (reference checks.py:528)."""
    if warn:
        from . import LOGGER

        LOGGER.warning("environment does not support cv2.imshow()")
    return False


def tpu_device_count() -> int:
    """Number of attached TPU devices (the cuda_device_count analogue,
    reference checks.py:698)."""
    try:
        import jax

        return sum(1 for d in jax.devices() if d.platform != "cpu")
    except Exception:
        return 0


def collect_system_info() -> dict:
    """OS / python / jax / device inventory (reference checks.py:573)."""
    import platform

    info = {
        "os": platform.platform(),
        "python": platform.python_version(),
    }
    try:
        import jax

        info["jax"] = jax.__version__
        info["devices"] = [str(d) for d in jax.devices()]
    except Exception as e:  # pragma: no cover
        info["jax"] = f"unavailable: {e}"
    from . import LOGGER

    for k, v in info.items():
        LOGGER.info(f"{k}: {v}")
    return info


def git_describe(path=None) -> str:
    """Human-readable git describe, '' outside a repo (reference checks.py:671)."""
    import subprocess
    from pathlib import Path

    try:
        return subprocess.run(
            ["git", "describe", "--tags", "--long", "--always"],
            cwd=str(path or Path(__file__).parent), capture_output=True,
            text=True, timeout=5, check=True,
        ).stdout.strip()
    except Exception:
        return ""


def print_args(args=None):
    """Log a {k: v} namespace compactly (reference checks.py:678)."""
    from . import LOGGER, colorstr

    if args is None:
        return
    if hasattr(args, "to_dict"):
        args = args.to_dict()
    LOGGER.info(
        colorstr("args: ") + ", ".join(f"{k}={v}" for k, v in sorted(args.items()))
    )
