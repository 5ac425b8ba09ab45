"""YAML -> model compiler (reference: ultralytics/nn/tasks.py:837 ``parse_model``).

The reference walks backbone+head lists and builds an nn.Sequential with
feature-routing attributes. Here parsing is a pure function producing a static
``LayerSpec`` tuple; ``YOLOModel`` is a flax module that instantiates the layers
in setup() and walks them with a saved-features dict. Everything is static at
trace time so XLA sees one fused graph; strides are computed symbolically from
the spec (no dummy 256px forward as in tasks.py:301-310).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import yaml
from flax import linen as nn

from . import modules as M
from . import heads as H

HEAD_MODULES = {"Detect", "v10Detect", "v10Detect3d", "Segment", "Pose", "OBB",
                "RTDETRDecoder", "WorldDetect"}

# Modules following the (c1, c2, ...) channel convention (tasks.py:869-899)
CH_MODULES = {
    "Conv", "DWConv", "Bottleneck", "SPPF", "SPP", "C2f", "C2", "C3", "PSA",
    "SCDown", "C2fCIB", "Focus", "Classify", "RepC3", "RepNCSPELAN4", "ADown",
    "SPPELAN", "C2fAttn", "C1", "C3x", "C3TR", "C3Ghost", "BottleneckCSP",
    "GhostConv", "GhostBottleneck", "ConvTranspose",
}
# Modules whose repeat count n is absorbed as an inner arg (tasks.py:910-912)
REPEAT_MODULES = {
    "C2f", "C2fCIB", "C2", "C3", "RepC3", "C2fAttn", "C1", "C3x", "C3TR",
    "C3Ghost", "BottleneckCSP",
}


def make_divisible(x: float, divisor: int = 8) -> int:
    """Round channels up to the nearest multiple (ultralytics checks.py)."""
    return math.ceil(x / divisor) * divisor


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    i: int                      # layer index
    f: Union[int, Tuple[int, ...]]  # input layer index/indices (-1 = previous)
    n: int                      # outer repeat count (after depth scaling)
    module: str                 # registry name
    args: Tuple[Any, ...]       # positional args (post channel-scaling)
    c2: int                     # output channels
    stride: int                 # cumulative spatial stride vs input image


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    nc: int
    layers: Tuple[LayerSpec, ...]
    save: Tuple[int, ...]       # indices whose outputs must be kept
    head_index: int
    head_module: str
    strides: Tuple[int, ...]    # detection strides, e.g. (8, 16, 32)
    yaml_extras: Tuple[Tuple[str, Any], ...] = ()  # 3D head config keys


def _freeze(x):
    if isinstance(x, list):
        return tuple(_freeze(v) for v in x)
    if isinstance(x, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in x.items()))
    return x


def parse_model_yaml(
    cfg: Union[str, dict], scale: Optional[str] = None, ch: int = 3,
    nc: Optional[int] = None,
) -> ModelSpec:
    """Compile a model YAML (reference dialect) into a static ModelSpec.

    Channel/depth scaling follows tasks.py:843-851,869-899 exactly:
    depth gain n = max(round(n*depth),1) for n>1; width gain
    c2 = make_divisible(min(c2, max_channels) * width, 8).
    """
    if isinstance(cfg, (str,)):
        import re
        from pathlib import Path

        path = Path(cfg)
        stem = path.stem
        # any family, like the reference guess_model_scale (tasks.py):
        # yolov8s, yolov9c, yolov10b, yolo11n, rtdetr-l, ...
        m = re.search(r"yolov?\d*[-_]?([nsmblxce])(?:[-_.]|$)", stem) or re.search(
            r"[-_]([nsmblx])$", stem
        )
        if scale is None and m:
            scale = m.group(1)
        with open(path) as f:
            d = yaml.safe_load(f)
    else:
        d = dict(cfg)

    d_nc = int(nc if nc is not None else d.get("nc", 80))
    depth, width, max_channels = 1.0, 1.0, float("inf")
    scales = d.get("scales")
    if scales:
        if scale is None:
            scale = next(iter(scales))
        depth, width, max_channels = scales[scale]

    extras = {
        k: d.get(k)
        for k in (
            "dsconv", "channels", "use_predecessors", "detach_predecessors",
            "deform", "common_head", "num_scales", "half_channels",
            "fgdm_predictor", "kernel_size_1", "kernel_size_2",
        )
        if k in d
    }

    ch_list: List[int] = [ch]
    layers: List[LayerSpec] = []
    save: List[int] = []
    stride_list: List[int] = []
    head_index = -1
    head_module = ""
    head_strides: Tuple[int, ...] = ()

    rows = list(d["backbone"]) + list(d["head"])
    for i, (f, n, mname, args) in enumerate(rows):
        mname = mname.replace("nn.Upsample", "Upsample").replace(
            "nn.ConvTranspose2d", "ConvTranspose2d"
        )
        args = list(args)
        for j, a in enumerate(args):
            if isinstance(a, str) and a == "nc":
                args[j] = d_nc
            elif isinstance(a, str) and a == "kpt_shape":
                args[j] = list(d.get("kpt_shape", [17, 3]))
            elif isinstance(a, str):
                # yaml 'None'/'True'/'False' arrive as strings (tasks.py:864)
                import ast
                import contextlib

                with contextlib.suppress(ValueError, SyntaxError):
                    args[j] = ast.literal_eval(a)
        n = max(round(n * depth), 1) if n > 1 else n

        f_first = f if isinstance(f, int) else f[0]
        in_stride = 1 if i == 0 else stride_list[f_first]

        if mname in CH_MODULES:
            c1 = ch_list[f]
            c2 = args[0]
            if c2 != d_nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            args = [c2, *args[1:]]
            if mname == "C2fAttn":  # tasks.py:902: scale embed ch + heads
                args[1] = make_divisible(min(args[1], max_channels // 2) * width, 8)
                args[2] = (
                    int(max(round(min(args[2], max_channels // 2 // 32)) * width, 1))
                    if args[2] > 1
                    else args[2]
                )
            if mname in REPEAT_MODULES:
                args.insert(1, n)
                n = 1
            s = 1
            if mname in ("Conv", "DWConv", "GhostConv") and len(args) >= 3:
                s = args[2]
            elif mname == "GhostBottleneck" and len(args) >= 3:
                s = args[2]
            elif mname == "SCDown":
                s = args[2]
            elif mname == "Focus":
                s = 2
            elif mname == "ADown":
                s = 2
            if mname == "ConvTranspose":
                s = args[2] if len(args) > 2 else 2
                out_stride = in_stride // s
            else:
                out_stride = in_stride * s
        elif mname == "Silence":
            c2 = ch_list[f]
            out_stride = in_stride
            args = []
        elif mname == "CBLinear":
            c1 = ch_list[f]
            c2 = args[0]  # list of branch channels; layer "channels" = list
            out_stride = in_stride
        elif mname == "CBFuse":
            c2 = ch_list[f[-1]]
            out_stride = stride_list[f[-1]]
        elif mname in ("HGStem", "HGBlock"):
            # tasks.py:919-923: c1, cm, c2 = ch[f], args[0], args[1] (unscaled)
            c1 = ch_list[f]
            cm, c2 = args[0], args[1]
            args = [cm, c2, *args[2:]]
            if mname == "HGBlock":
                args.insert(3, n)  # -> [cm, c2, k, n, light, shortcut]
                n = 1
            out_stride = in_stride * (4 if mname == "HGStem" else 1)
        elif mname == "AIFI":
            c2 = ch_list[f]
            args = [c2, *args]
            out_stride = in_stride
        elif mname == "ConvTranspose2d":
            c1 = ch_list[f]
            c2 = make_divisible(min(args[0], max_channels) * width, 8)
            args = [c2, *args[1:]]
            out_stride = in_stride // (args[2] if len(args) > 2 else 2)
        elif mname == "Upsample":
            c2 = ch_list[f]
            out_stride = in_stride // args[1]
        elif mname == "Concat":
            c2 = sum(ch_list[x] for x in f)
            out_stride = in_stride
            args = []
        elif mname == "ResNetLayer":
            # yaml args [c2, s, is_first, n]; output e*c2 unless stem
            c2 = args[0] if (len(args) > 2 and args[2]) else args[0] * 4
            s_ = args[1] if len(args) > 1 else 1
            out_stride = in_stride * (4 if (len(args) > 2 and args[2]) else s_)
        elif mname == "ImagePoolingAttn":
            # updates the text features mid-network (yolov8-world v1); the
            # layer "output" is the text tensor (tasks.py:631)
            in_ch = tuple(ch_list[x] for x in f)
            args = [args[0] if args else 256, in_ch]
            c2 = 512  # ct
            out_stride = in_stride
        elif mname in HEAD_MODULES:
            in_ch = tuple(ch_list[x] for x in f)
            head_strides = tuple(stride_list[x] for x in f)
            if mname == "WorldDetect":
                embed = args[1] if len(args) > 1 else 512
                with_bn = bool(args[2]) if len(args) > 2 else False
                args = [d_nc, in_ch, embed, with_bn]
            elif mname == "Segment":
                # [nc, nm, npr]: npr width-scaled (tasks.py:931)
                nm = args[1] if len(args) > 1 else 32
                npr = args[2] if len(args) > 2 else 256
                npr = make_divisible(min(npr, max_channels) * width, 8)
                args = [d_nc, in_ch, nm, npr]
            elif mname == "Pose":
                kpt = tuple(args[1]) if len(args) > 1 else (17, 3)
                args = [d_nc, in_ch, kpt]
            elif mname == "OBB":
                ne = args[1] if len(args) > 1 else 1
                args = [d_nc, in_ch, ne]
            else:
                args = [d_nc, in_ch]
            c2 = 0
            out_stride = in_stride
            head_index = i
            head_module = mname
        else:
            raise ValueError(f"unknown module {mname!r} in model yaml")

        layers.append(
            LayerSpec(
                i=i,
                f=f if isinstance(f, int) else tuple(f),
                n=n,
                module=mname,
                args=tuple(_freeze(a) for a in args),
                c2=c2,
                stride=out_stride,
            )
        )
        save.extend(x % i for x in ([f] if isinstance(f, int) else f) if x != -1)
        if i == 0:
            ch_list = []
        ch_list.append(c2)
        stride_list = stride_list if i > 0 else []
        stride_list.append(out_stride)

    if head_index == -1 and layers and layers[-1].module == "Classify":
        head_index = layers[-1].i
        head_module = "Classify"

    return ModelSpec(
        nc=d_nc,
        layers=tuple(layers),
        save=tuple(sorted(set(save))),
        head_index=head_index,
        head_module=head_module,
        strides=head_strides,
        yaml_extras=tuple(sorted((k, _freeze(v)) for k, v in extras.items())),
    )


def _build_module(spec: LayerSpec, name: str, extras: Dict[str, Any]):
    a = spec.args
    if spec.module == "Conv":
        k = a[1] if len(a) > 1 else 1
        s = a[2] if len(a) > 2 else 1
        p = a[3] if len(a) > 3 else None
        g = a[4] if len(a) > 4 else 1
        d = a[5] if len(a) > 5 else 1
        act = a[6] if len(a) > 6 else True
        # layer 0 with 3 input channels maps badly onto the MXU; rewrite it
        # as an exact space-to-depth conv when serving (ops/spd_stem.py).
        # spd_stem="all" extends the rewrite to EVERY dense k3/s2 conv: the
        # backward's grad-of-input becomes a plain s1 conv grad instead of a
        # base-dilated transposed conv (the slow TPU path) — see
        # tools/profile_spd.py for the measured effect
        spd_flag = extras.get("spd_stem")
        spd = bool(
            spd_flag
            and (spec.i == 0 or spd_flag == "all")
            and k == 3
            and s == 2
            and p in (None, 1)
            and g == 1
            and d == 1
        )
        if spd and spd_flag == "packed" and spec.i == 0:
            # serving contract: layer 0 consumes a pre-packed
            # (B, H/2, W/2, 12) input emitted by the preprocess stage
            spd = "packed"
        return M.Conv(a[0], k, s, p, g, d, act, spd, name=name)
    if spec.module == "Bottleneck":
        shortcut = a[1] if len(a) > 1 else True
        return M.Bottleneck(a[0], shortcut, name=name)
    if spec.module == "DWConv":
        k = a[1] if len(a) > 1 else 1
        s = a[2] if len(a) > 2 else 1
        act = a[4] if len(a) > 4 else True
        return M.DWConv(a[0], k, s, act, name=name)
    if spec.module == "HGStem":
        return M.HGStem(a[0], a[1], name=name)
    if spec.module == "HGBlock":
        k = a[2] if len(a) > 2 else 3
        nrep = a[3] if len(a) > 3 else 6
        light = a[4] if len(a) > 4 else False
        shortcut = a[5] if len(a) > 5 else False
        return M.HGBlock(a[0], a[1], k, nrep, light, shortcut, name=name)
    if spec.module == "RepC3":
        return M.RepC3(a[0], a[1] if len(a) > 1 else 3, name=name)
    if spec.module == "RepNCSPELAN4":
        return M.RepNCSPELAN4(a[0], a[1], a[2], a[3] if len(a) > 3 else 1, name=name)
    if spec.module == "ADown":
        return M.ADown(a[0], name=name)
    if spec.module == "SPPELAN":
        return M.SPPELAN(a[0], a[1], a[2] if len(a) > 2 else 5, name=name)
    if spec.module == "Silence":
        return M.Silence(name=name)
    if spec.module == "CBLinear":
        return M.CBLinear(tuple(a[0]), a[1] if len(a) > 1 else 1, name=name)
    if spec.module == "CBFuse":
        return M.CBFuse(tuple(a[0]), name=name)
    if spec.module == "AIFI":
        from .transformer import AIFI

        return AIFI(a[0], a[1] if len(a) > 1 else 2048,
                    a[2] if len(a) > 2 else 8, name=name)
    if spec.module == "RTDETRDecoder":
        from .rtdetr_head import RTDETRDecoder

        return RTDETRDecoder(nc=a[0], ch=a[1], name=name)
    if spec.module == "C2f":
        c2, n = a[0], a[1]
        shortcut = a[2] if len(a) > 2 else False
        return M.C2f(c2, n, shortcut, name=name)
    if spec.module == "C3":
        c2, n = a[0], a[1]
        shortcut = a[2] if len(a) > 2 else True
        return M.C3(c2, n, shortcut, name=name)
    if spec.module == "C2":
        c2, n = a[0], a[1]
        shortcut = a[2] if len(a) > 2 else True
        return M.C2(c2, n, shortcut, name=name)
    if spec.module == "SPP":
        return M.SPP(a[0], tuple(a[1]) if len(a) > 1 else (5, 9, 13), name=name)
    if spec.module == "Focus":
        return M.Focus(a[0], a[1] if len(a) > 1 else 1, name=name)
    if spec.module == "Classify":
        return H.Classify(a[0], name=name)
    if spec.module == "Segment":
        return H.Segment(nc=a[0], ch=a[1], nm=a[2], npr=a[3], name=name)
    if spec.module == "Pose":
        return H.Pose(nc=a[0], ch=a[1], kpt_shape=tuple(a[2]), name=name)
    if spec.module == "OBB":
        return H.OBB(nc=a[0], ch=a[1], ne=a[2], name=name)
    if spec.module == "C2fCIB":
        c2, n = a[0], a[1]
        shortcut = a[2] if len(a) > 2 else False
        lk = a[3] if len(a) > 3 else False
        return M.C2fCIB(c2, n, shortcut, lk, name=name)
    if spec.module == "SCDown":
        return M.SCDown(a[0], a[1], a[2], name=name)
    if spec.module == "SPPF":
        return M.SPPF(a[0], a[1] if len(a) > 1 else 5, name=name)
    if spec.module == "PSA":
        return M.PSA(a[0], name=name)
    if spec.module == "Upsample":
        # args = [size(None), scale_factor, mode]; the spec's stride
        # bookkeeping reads the same slot (a hardcoded 2 contradicted it)
        factor = int(a[1]) if len(a) > 1 and a[1] else 2
        return M.Upsample(factor, name=name)
    if spec.module == "ConvTranspose2d":
        k = a[1] if len(a) > 1 else 2
        s = a[2] if len(a) > 2 else 2
        return nn.ConvTranspose(
            features=a[0], kernel_size=(k, k), strides=(s, s), padding="VALID",
            use_bias=True, transpose_kernel=True, name=name,
        )
    if spec.module == "Concat":
        return M.Concat(name=name)
    if spec.module == "C1":
        return M.C1(a[0], a[1], name=name)
    if spec.module == "C3x":
        return M.C3x(a[0], a[1], a[2] if len(a) > 2 else True, name=name)
    if spec.module == "C3TR":
        return M.C3TR(a[0], a[1], a[2] if len(a) > 2 else True, name=name)
    if spec.module == "C3Ghost":
        return M.C3Ghost(a[0], a[1], a[2] if len(a) > 2 else True, name=name)
    if spec.module == "BottleneckCSP":
        return M.BottleneckCSP(a[0], a[1], a[2] if len(a) > 2 else True, name=name)
    if spec.module == "GhostConv":
        return M.GhostConv(
            a[0], a[1] if len(a) > 1 else 1, a[2] if len(a) > 2 else 1, name=name
        )
    if spec.module == "GhostBottleneck":
        return M.GhostBottleneck(
            a[0], a[1] if len(a) > 1 else 3, a[2] if len(a) > 2 else 1, name=name
        )
    if spec.module == "ConvTranspose":
        return M.ConvTransposeBlock(
            a[0], a[1] if len(a) > 1 else 2, a[2] if len(a) > 2 else 2, name=name
        )
    if spec.module == "ResNetLayer":
        return M.ResNetLayer(
            a[0], a[1] if len(a) > 1 else 1,
            bool(a[2]) if len(a) > 2 else False,
            a[3] if len(a) > 3 else 1, name=name,
        )
    if spec.module == "C2fAttn":
        from .world import C2fAttn

        c2, n, ec, nh = a[0], a[1], a[2], a[3]
        shortcut = a[4] if len(a) > 4 else False
        return C2fAttn(c2, n, ec, nh, shortcut=shortcut, name=name)
    if spec.module == "ImagePoolingAttn":
        from .world import ImagePoolingAttn

        return ImagePoolingAttn(ec=a[0], ch=a[1], name=name)
    if spec.module == "WorldDetect":
        from .world import WorldDetect

        return WorldDetect(nc=a[0], ch=a[1], embed=a[2], with_bn=a[3], name=name)
    if spec.module == "Detect":
        return H.Detect(nc=a[0], ch=a[1], name=name)
    if spec.module == "v10Detect":
        return H.V10Detect(
            nc=a[0], ch=a[1],
            eval_one2many=not extras.get("fast_eval", False), name=name,
        )
    if spec.module == "v10Detect3d":
        from .heads3d import V10Detect3d

        head_cfg = tuple(
            sorted(
                (k, v)
                for k, v in extras.items()
                if k not in ("fast_eval", "spd_stem", "sparse_eval")
            )
        )
        return V10Detect3d(
            nc=a[0], ch=a[1], cfg=head_cfg,
            eval_one2many=not extras.get("fast_eval", False),
            sparse_eval=bool(extras.get("sparse_eval", False)), name=name,
        )
    raise ValueError(spec.module)


# Blocks eligible for per-block remat: plain (x, train) call signature and
# no head/decode logic. Heads and shape-plumbing ops (Concat/Upsample) stay
# un-rematted — their activations are tiny or needed for the loss anyway.
_REMAT_BLOCKS = frozenset(
    {
        "Conv", "DWConv", "Focus", "GhostConv", "RepConv", "Bottleneck",
        "C2f", "C2", "C3", "C3k2", "C2fCIB", "SCDown", "SPPF", "SPPELAN",
        "PSA", "C2PSA", "RepVGGDW", "ADown", "ELAN1", "RepNCSPELAN4",
        "HGStem", "HGBlock", "GhostBottleneck", "C3Ghost", "C3TR", "C3x",
        "AIFI", "CBAM",
    }
)


def _block_apply(mdl, x, train):
    """Lifted-transform target for nn.remat over a single block module."""
    return mdl(x, train)


class YOLOModel(nn.Module):
    """The compiled detection model: backbone + PAN neck + head.

    Equivalent of reference DetectionModel/YOLOv10DetectionModel
    (tasks.py:283,645) but a single pure flax module over NHWC inputs.
    """

    spec: ModelSpec
    fast_eval: bool = False  # serving: skip train-only head branches at eval
    spd_stem: bool = False  # serving: exact space-to-depth stem rewrite
    sparse_eval: bool = False  # 3D head: o2o regression on top-k patches only
    # remat: wrap each backbone/neck block in jax.checkpoint — activations
    # inside a block are recomputed in the backward instead of saved, cutting
    # peak HBM from sum-of-all-intermediates to sum-of-block-I/O. Unlocks
    # larger train batches (B=256 OOM'd without it); costs ~1 extra forward.
    remat: bool = False

    def setup(self):
        extras = dict(self.spec.yaml_extras)
        extras["strides"] = self.spec.strides
        extras["fast_eval"] = self.fast_eval
        extras["spd_stem"] = self.spd_stem
        extras["sparse_eval"] = self.sparse_eval
        # n>1 layers are torch nn.Sequential(model.i.0..n-1); flatten to
        # model_{i}_{j} names for converter parity
        self.layers = [
            (
                _build_module(s, f"model_{s.i}", extras)
                if s.n == 1
                else [
                    _build_module(s, f"model_{s.i}_{j}", extras) for j in range(s.n)
                ]
            )
            for s in self.spec.layers
        ]

    def __call__(
        self, x: jax.Array, train: bool = False, head_kwargs=None, txt_feats=None
    ):
        """x: (B, H, W, 3) normalized image. Returns head output.

        head_kwargs: optional extra kwargs for the final (head) layer — used
        to feed RT-DETR contrastive-denoising queries (train/cdn.py) the way
        the reference passes `batch` into RTDETRDecoder (head.py:367).
        txt_feats: (B, K, 512) text features for YOLO-World layers
        (tasks.py:616 WorldModel.predict); defaults to zeros over nc classes."""
        saved: Dict[int, jax.Array] = {}
        out = x
        last_i = self.spec.layers[-1].i
        has_world = any(
            s.module in ("C2fAttn", "WorldDetect", "ImagePoolingAttn")
            for s in self.spec.layers
        )
        if has_world and txt_feats is None:
            txt_feats = jnp.zeros((x.shape[0], self.spec.nc, 512), x.dtype)
        ori_txt = txt_feats
        for spec, layer in zip(self.spec.layers, self.layers):
            def _lookup(j):
                if j == -1:
                    return out
                return saved[j if j >= 0 else spec.i + j]

            if isinstance(spec.f, tuple):
                inp = [_lookup(j) for j in spec.f]
            else:
                inp = _lookup(spec.f)

            if spec.module in ("Concat", "Upsample", "ConvTranspose2d"):
                out = layer(inp)
            elif spec.module == "C2fAttn":
                out = layer(inp, txt_feats, train)
            elif spec.module == "WorldDetect":
                out = layer(inp, ori_txt, train)
            elif spec.module == "ImagePoolingAttn":
                txt_feats = layer(inp, txt_feats)
                out = txt_feats
            elif isinstance(layer, (list, tuple)):  # n>1 sequential repeat (flax stores tuples)
                out = inp
                for sub in layer:
                    if self.remat and spec.module in _REMAT_BLOCKS:
                        out = nn.remat(_block_apply, static_argnums=(2,))(
                            sub, out, train
                        )
                    else:
                        out = sub(out, train)
            elif head_kwargs is not None and spec.i == last_i:
                out = layer(inp, train, **head_kwargs)
            elif self.remat and spec.module in _REMAT_BLOCKS:
                out = nn.remat(_block_apply, static_argnums=(2,))(layer, inp, train)
            else:
                out = layer(inp, train)
            if spec.i in self.spec.save:
                saved[spec.i] = out
        return out


def build_model(
    cfg: Union[str, dict],
    scale: Optional[str] = None,
    nc: Optional[int] = None,
    fast_eval: bool = False,
    spd_stem: bool = False,
    remat: bool = False,
    sparse_eval: bool = False,
) -> Tuple[YOLOModel, ModelSpec]:
    spec = parse_model_yaml(cfg, scale=scale, nc=nc)
    return (
        YOLOModel(spec=spec, fast_eval=fast_eval, spd_stem=spd_stem, remat=remat,
                  sparse_eval=sparse_eval),
        spec,
    )
