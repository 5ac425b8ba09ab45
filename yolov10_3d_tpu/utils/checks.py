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
