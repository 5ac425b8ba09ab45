"""Detection heads (reference: /root/reference/ultralytics/nn/modules/head.py).

Heads return raw per-scale NHWC feature maps; anchor generation, DFL decode and
NMS-free top-k postprocessing are pure functions in ops/ (TPU-friendly: the
head stays a static conv graph, decode fuses into one jitted epilogue).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import Conv

REG_MAX = 16


def _conv1x1(features: int) -> nn.Conv:
    """Bare 1x1 conv with bias (torch nn.Conv2d head output layers)."""
    return nn.Conv(features=features, kernel_size=(1, 1), padding="VALID", use_bias=True)


def _box_branch(c_in: int, c2: int, reg_max: int) -> list:
    """cv2 box branch: Conv3x3, Conv3x3, 1x1 conv -> 4*reg_max (head.py:41-47)."""
    return [Conv(c2, 3), Conv(c2, 3), _conv1x1(4 * reg_max)]


def _v10_cls_branch(c_in: int, c3: int, nc: int) -> list:
    """v10 lightweight cls branch (head.py:512-514): two (dw3x3 + pw1x1) stages
    then a 1x1 conv. Nested to mirror torch's Sequential(Sequential(..)..)."""
    return [
        [Conv(c_in, 3, g=c_in), Conv(c3, 1)],
        [Conv(c3, 3, g=c3), Conv(c3, 1)],
        _conv1x1(nc),
    ]


def _run_seq(mods, x, train):
    for m in mods:
        if isinstance(m, (list, tuple)):
            x = _run_seq(m, x, train)
        elif isinstance(m, nn.Conv):
            x = m(x)
        else:
            x = m(x, train)
    return x


class Detect(nn.Module):
    """YOLOv8 anchor-free DFL head (reference head.py:22).

    Returns per-scale (B, H, W, 4*reg_max + nc) maps.
    """

    nc: int
    ch: Tuple[int, ...]

    def setup(self):
        c2 = max(16, self.ch[0] // 4, REG_MAX * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        self.cv2 = [_box_branch(x, c2, REG_MAX) for x in self.ch]
        self.cv3 = [
            [Conv(c3, 3), Conv(c3, 3), _conv1x1(self.nc)] for x in self.ch
        ]

    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        return [
            jnp.concatenate(
                [_run_seq(self.cv2[i], x, train), _run_seq(self.cv3[i], x, train)],
                axis=-1,
            )
            for i, x in enumerate(xs)
        ]


class V10Detect(nn.Module):
    """YOLOv10 NMS-free dual-assignment head (reference head.py:505 ``v10Detect``).

    Training: returns {"one2many": [...], "one2one": [...]} raw maps, the
    one2one branch computed on stop_gradient'ed features (head.py:520).
    Decode lives in ops.postprocess.decode_detect / v10_postprocess.
    """

    nc: int
    ch: Tuple[int, ...]
    max_det: int = 300
    # serving mode: skip the one2many branch at eval (it only feeds the
    # training loss; inference reads one2one exclusively — predict.py:8-38)
    eval_one2many: bool = True

    def setup(self):
        c2 = max(16, self.ch[0] // 4, REG_MAX * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        self.cv2 = [_box_branch(x, c2, REG_MAX) for x in self.ch]
        self.cv3 = [_v10_cls_branch(x, c3, self.nc) for x in self.ch]
        self.one2one_cv2 = [_box_branch(x, c2, REG_MAX) for x in self.ch]
        self.one2one_cv3 = [_v10_cls_branch(x, c3, self.nc) for x in self.ch]

    def _forward_feat(self, xs, cv2, cv3, train):
        return [
            jnp.concatenate(
                [_run_seq(cv2[i], x, train), _run_seq(cv3[i], x, train)], axis=-1
            )
            for i, x in enumerate(xs)
        ]

    def __call__(
        self, xs: Sequence[jax.Array], train: bool = False
    ) -> Dict[str, List[jax.Array]]:
        xs_det = [jax.lax.stop_gradient(x) for x in xs]
        one2one = self._forward_feat(xs_det, self.one2one_cv2, self.one2one_cv3, train)
        if not train and not self.eval_one2many:
            return {"one2one": one2one}
        one2many = self._forward_feat(xs, self.cv2, self.cv3, train)
        return {"one2many": one2many, "one2one": one2one}


class Segment(nn.Module):
    """YOLOv8 segmentation head (reference head.py:112): Detect + mask
    coefficients (cv4) + prototype masks (proto). Returns dict of raw maps."""

    nc: int
    ch: Tuple[int, ...]
    nm: int = 32
    npr: int = 256

    def setup(self):
        from .modules import Proto

        c2 = max(16, self.ch[0] // 4, REG_MAX * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        c4 = max(self.ch[0] // 4, self.nm)
        self.cv2 = [_box_branch(x, c2, REG_MAX) for x in self.ch]
        self.cv3 = [[Conv(c3, 3), Conv(c3, 3), _conv1x1(self.nc)] for x in self.ch]
        self.cv4 = [[Conv(c4, 3), Conv(c4, 3), _conv1x1(self.nm)] for x in self.ch]
        self.proto = Proto(self.npr, self.nm)

    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        p = self.proto(xs[0], train)  # (B, 2*H0, 2*W0, nm)
        det = [
            jnp.concatenate(
                [_run_seq(self.cv2[i], x, train), _run_seq(self.cv3[i], x, train)],
                axis=-1,
            )
            for i, x in enumerate(xs)
        ]
        mc = [_run_seq(self.cv4[i], x, train) for i, x in enumerate(xs)]
        return {"det": det, "mask_coefs": mc, "protos": p}


class Pose(nn.Module):
    """YOLOv8 pose head (reference head.py:169): Detect + keypoint branch."""

    nc: int
    ch: Tuple[int, ...]
    kpt_shape: Tuple[int, int] = (17, 3)

    def setup(self):
        self.nk = self.kpt_shape[0] * self.kpt_shape[1]
        c2 = max(16, self.ch[0] // 4, REG_MAX * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        c4 = max(self.ch[0] // 4, self.nk)
        self.cv2 = [_box_branch(x, c2, REG_MAX) for x in self.ch]
        self.cv3 = [[Conv(c3, 3), Conv(c3, 3), _conv1x1(self.nc)] for x in self.ch]
        self.cv4 = [[Conv(c4, 3), Conv(c4, 3), _conv1x1(self.nk)] for x in self.ch]

    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        det = [
            jnp.concatenate(
                [_run_seq(self.cv2[i], x, train), _run_seq(self.cv3[i], x, train)],
                axis=-1,
            )
            for i, x in enumerate(xs)
        ]
        kpt = [_run_seq(self.cv4[i], x, train) for i, x in enumerate(xs)]
        return {"det": det, "kpts": kpt}


class OBB(nn.Module):
    """YOLOv8 oriented-box head (reference head.py:138): Detect + angle branch.
    Angle is returned pre-activation; decode maps sigmoid(a)-0.25 -> [-pi/4,
    3pi/4) (ops.postprocess.decode_obb)."""

    nc: int
    ch: Tuple[int, ...]
    ne: int = 1

    def setup(self):
        c2 = max(16, self.ch[0] // 4, REG_MAX * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        c4 = max(self.ch[0] // 4, self.ne)
        self.cv2 = [_box_branch(x, c2, REG_MAX) for x in self.ch]
        self.cv3 = [[Conv(c3, 3), Conv(c3, 3), _conv1x1(self.nc)] for x in self.ch]
        self.cv4 = [[Conv(c4, 3), Conv(c4, 3), _conv1x1(self.ne)] for x in self.ch]

    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        det = [
            jnp.concatenate(
                [_run_seq(self.cv2[i], x, train), _run_seq(self.cv3[i], x, train)],
                axis=-1,
            )
            for i, x in enumerate(xs)
        ]
        angle = [_run_seq(self.cv4[i], x, train) for i, x in enumerate(xs)]
        return {"det": det, "angle": angle}


class Classify(nn.Module):
    """YOLOv8 classification head (reference head.py:210): Conv -> GAP ->
    Linear. Returns logits (softmax applied by the task postprocess)."""

    c2: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = 1280
        x = Conv(c_, 1, 1, name="conv")(x, train)
        x = x.mean(axis=(1, 2))  # AdaptiveAvgPool2d(1)
        return nn.Dense(self.c2, name="linear")(x)


def detect_bias_init(params: dict, nc: int, strides: Sequence[int]) -> dict:
    """Apply the reference's head bias init (head.py:98-105, 537-543):
    box branch final bias = 1.0, cls branch final bias = log(5/nc/(640/s)^2).

    Operates on the head's param sub-tree (pure function, returns new tree).
    """
    import flax

    params = flax.core.unfreeze(params)
    for prefix in ("cv2", "one2one_cv2"):
        for i in range(len(strides)):
            key = f"{prefix}_{i}_2"
            if key in params:
                b = params[key]["bias"]
                params[key]["bias"] = jnp.ones_like(b)
    for prefix in ("cv3", "one2one_cv3"):
        for i, s in enumerate(strides):
            key = f"{prefix}_{i}_2"
            if key in params:
                b = params[key]["bias"]
                params[key]["bias"] = jnp.full_like(
                    b, math.log(5 / nc / (640 / s) ** 2)
                )
    # v10 dual head: one2one branches are the reference's deepcopies of the
    # o2m cv2/cv3 (head.py:869-870) — mirror the full subtrees so both
    # branches start IDENTICAL (review finding: kernels were independent)
    for k in list(params.keys()):
        if k.startswith(("cv2_", "cv3_")):
            dst = "one2one_" + k
            if dst in params:
                params[dst] = jax.tree.map(jnp.array, params[k])
    return params
