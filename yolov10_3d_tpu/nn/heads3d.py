"""Monocular-3D detection head (reference: head.py:545 ``v10Detect3d``).

8 decoupled regression branches per scale (cls, o2d, s2d, o3d, s3d, hd, dep,
dep_un), duplicated into one-to-one (o2o, on stop-gradient features) and
one-to-many (o2m) sets for consistent dual assignment.

TPU design note: the reference's eval path runs 7 regression heads only on
sparse top-50 patches (head.py:694 ``inference_forward_feat``). Patch conv with
zero padding equals the dense padded conv at every location, so the dense
forward is numerically identical; dense is the XLA-regular default and the
top-k select happens in the fused decode epilogue instead (SURVEY.md §7 hard
part 5). ``sparse_eval=True`` additionally ships a static-shape TPU redesign
of the sparse path (``_sparse_forward_feat``): the regression branches carry
~7/8 of the head's ~106 GFLOP/img, so serving skips them everywhere except
the top-``max_det`` candidate patches — one gather in, one one-hot-einsum
scatter out, every shape static. Measured +22-27% end-to-end at 384x1280
(tools/exp_sparse_infer3d.py: 956 -> 1167 img/s at B=64); the remaining gap
to the FLOP ratio is the backbone+neck+cls floor (~48 ms of the 67 ms dense
batch — per-op attribution in tools/exp_sparse_profile.py), not the patch
machinery (~7 ms). Detections are provably identical to dense:
patch convs reproduce dense values exactly at candidate centers (the patch
covers the full receptive field, and dense zero padding equals patch zero
padding at image borders), and the final top-k can only select candidate
anchors (an anchor in the global top-``max_det`` by max-class score is
necessarily in its own scale's top-``max_det`` by the same monotone score).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .heads import _conv1x1, _run_seq
from .modules import Conv

OUTPUT_CHANNELS = {
    "cls": None,  # nc
    "o2d": 2,
    "s2d": 2,
    "o3d": 2,
    "s3d": 3,
    "hd": 24,
    "dep": 1,
    "dep_un": 1,
}

# feature-chaining graph when use_predecessors (head.py:585-593)
PREDECESSORS = {
    "cls": [],
    "o2d": [],
    "s2d": [],
    "o3d": ["cls"],
    "s3d": ["cls"],
    "hd": ["cls"],
    "dep": ["cls", "s3d"],
    "dep_un": ["cls", "s3d", "dep"],
}
DEP_NORM = 65.0
# per-scale candidate count of the sparse eval path (reference head.py:663
# ``select_candidates`` top-50). Facades must not decode with max_det above
# this when sparse_eval is on: off-candidate anchors carry zero regression.
SPARSE_K = 50


def _build_conv(c2: int, k: int, dsconv: bool) -> object:
    """head.py:652 ``build_conv``: plain Conv or depthwise-separable pair."""
    if dsconv:
        return ["__dsconv__", k, c2]  # resolved in _branch (needs input ch)
    return Conv(c2, k)


class V10Detect3d(nn.Module):
    """Raw per-scale maps out; decode lives in ops.postprocess.decode_detect3d."""

    nc: int
    ch: Tuple[int, ...]
    cfg: Tuple[Tuple[str, object], ...] = ()
    max_det: int = SPARSE_K
    eval_one2many: bool = True  # serving mode skips o2m + embeddings at eval
    sparse_eval: bool = False  # o2o regression branches on top-k patches only

    def setup(self):
        cfg = dict(self.cfg)
        self.dsconv = bool(cfg.get("dsconv") or False)
        self.deform = bool(cfg.get("deform") or False)
        self.use_predecessors = bool(cfg.get("use_predecessors") or False)
        self.detach_predecessors = cfg.get("detach_predecessors")
        self.common_head = bool(cfg.get("common_head") or False)
        self.half_channels = bool(cfg.get("half_channels") or False)
        self.fgdm_pred = bool(cfg.get("fgdm_predictor") or False)
        self.k1 = int(cfg.get("kernel_size_1") or 3)
        self.k2 = int(cfg.get("kernel_size_2") or 3)
        self.nl = int(cfg.get("num_scales") or len(self.ch))
        channels = dict(cfg.get("channels") or {})
        ch = list(self.ch[: self.nl])

        out_ch = dict(OUTPUT_CHANNELS)
        out_ch["cls"] = self.nc
        self.output_channels = out_ch
        self.no = sum(out_ch.values())

        def extra(name):
            if not self.use_predecessors:
                return 0
            return sum(out_ch[p] for p in PREDECESSORS[name])

        def branch(name):
            """One head over all scales: [Conv(k1), Conv(k2), 1x1] each
            (head.py:631 ``build_head``); small variant when common_head."""
            mid = int(channels.get(f"{name}_c", 128))
            out = out_ch[name]
            mid2 = mid // 2 if self.half_channels else mid
            scales = []
            for c_in in ch:
                if self.common_head:
                    mods = [Conv(mid, self.k1), _conv1x1(out)]
                elif self.dsconv:
                    cin_tot = c_in + extra(name)
                    # deform applies to the k1 conv only (head.py:634-636)
                    mods = [
                        [Conv(cin_tot, self.k1, g=cin_tot, deform=self.deform),
                         Conv(mid, 1)],
                        [Conv(mid, self.k2, g=mid), Conv(mid2, 1)],
                        _conv1x1(out),
                    ]
                else:
                    mods = [Conv(mid, self.k1, deform=self.deform),
                            Conv(mid2, self.k2), _conv1x1(out)]
                scales.append(mods)
            return scales

        names = list(out_ch.keys())
        # o2o heads use the torch attribute names cls/o2d/... (head.py:627);
        # o2m heads are the deepcopy registered as o2m_heads.{j}
        self.cls = branch("cls")
        self.o2d = branch("o2d")
        self.s2d = branch("s2d")
        self.o3d = branch("o3d")
        self.s3d = branch("s3d")
        self.hd = branch("hd")
        self.dep = branch("dep")
        self.dep_un = branch("dep_un")
        self.o2m_heads = [branch(n) for n in names]
        if self.common_head:
            self.common = [
                Conv(c, 3) if not self.dsconv else [Conv(c, 3, g=c), Conv(c, 1)]
                for c in ch
            ]
        if self.fgdm_pred:
            self.fgdm_predictor = DepthPredictor(ch=tuple(ch))

    # flax requires dict attrs assigned in setup to have module leaves; we use
    # a dict of lists — supported (names: heads_o2o_cls_0_0, ...). To keep
    # torch-key parity we instead expose properties below.

    def _run(self, mods, x, train):
        return _run_seq(mods, x, train)  # shared sequential runner (heads.py)

    def _forward_feat(self, xs, heads, train):
        """head.py:717 ``forward_feat``: run 8 branches per scale, chaining
        predecessor outputs when configured; returns (maps, dep embeddings)."""
        names = list(self.output_channels.keys())
        ys, embs = [], []
        for i in range(self.nl):
            x = xs[i]
            if self.common_head:
                x = self._run(
                    self.common[i] if isinstance(self.common[i], list) else [self.common[i]],
                    x,
                    train,
                )
            outputs = {}
            emb = None
            for j, name in enumerate(names):
                mods = heads[j][i]
                if self.use_predecessors and PREDECESSORS[name]:
                    preds = [
                        outputs[k] / DEP_NORM if k == "dep" else outputs[k]
                        for k in PREDECESSORS[name]
                    ]
                    inp = jnp.concatenate(
                        [x] + [jax.lax.stop_gradient(p) for p in preds], axis=-1
                    )
                else:
                    inp = x
                if name == "dep" and not self.common_head:
                    # expose the first-conv embeddings for distillation
                    # (head.py:745 ``single_head_forward``)
                    e = self._run([mods[0]], inp, train)
                    emb = e
                    outputs[name] = self._run(mods[1:], e, train)
                else:
                    outputs[name] = self._run(mods, inp, train)
            ys.append(jnp.concatenate([outputs[n] for n in names], axis=-1))
            embs.append(emb)
        return ys, embs

    def _fusable(self, heads, i):
        """The im2col fast path reads raw kernels/BN stats from the standard
        [Conv(k1), Conv(k2), 1x1] branch; anything else (dsconv pairs, int8
        quantized convs, mid-init empty scopes) takes the dense fallback."""
        from . import modules as _m

        # _Int8Conv declares the identical conv/kernel param tree (so the
        # structure check below passes) but its forward quantizes; the fused
        # path would silently compute unquantized math (review finding)
        if self.dsconv or self.is_initializing() or getattr(_m, "_INT8_MODE", False):
            return False

        def ok(m):
            try:
                p = m.variables["params"]
                s = m.variables["batch_stats"]
            except Exception:
                return False
            return (
                "conv" in p and "kernel" in p["conv"]
                and p["conv"]["kernel"].ndim == 4 and "bn" in s
            )

        return all(
            ok(heads[j][i][0]) and ok(heads[j][i][1])
            for j in range(1, len(self.output_channels))
        )

    def _sparse_forward_feat(self, xs, heads, train):
        """Static-shape redesign of the reference's sparse top-k patch
        inference (head.py:663-716 ``select_candidates``/``extract_patches``/
        ``inference_forward_feat``).

        Per scale: dense cls branch -> top-``max_det`` anchors by max-class
        logit (matching the reference's raw-score ``torch.max`` selection) ->
        gather one (k1+k2-1)^2 receptive-field patch per candidate from the
        padded feature map -> **one VALID conv over all seven branches'
        concatenated conv1 kernels** on the patch batch (output spatial is
        exactly the k2 x k2 interior conv2's center needs; BN folded to a
        per-channel affine) -> conv2 as one batched einsum over branches at
        the center position -> seven tiny 1x1 matmuls. Center values equal
        the dense forward up to fp reassociation (BN folded to a*x+b, conv
        tiling); off-candidate is zero, exactly like the reference's
        ``torch.zeros`` scatter target.

        Measured design choices (tools/exp_sparse_profile.py and
        exp_sparse_gather.py, v5e B=64 384x1280 shapes): the VALID conv is
        3.7x a hand im2col stack+matmul of the same contraction; a SAME-
        padded patch-conv first version (25 positions computed, 1 useful)
        capped the e2e win at +6-8%; take_along_axis row gathers beat
        lax.gather block variants by >4x (vmapped gathers lower to loops).
        Per-scale static crossover: sparse only when 2*K*k2^2 < H*W — the
        patch path must beat dense by ~2x in FLOPs to cover its
        gather+scatter overhead, which puts the P5-sized maps on the dense
        branch. Final detections are unaffected either way (the decode top-k
        only ever selects per-scale top-K anchors, whose regression values
        are identical). Gather/scatter are row-wise on the major axis
        (channel-contiguous) — no minor-axis gathers (PARITY.md round-2
        one-hot-contraction notes).
        """
        from .modules import BN_EPS, apply_act

        names = list(self.output_channels.keys())
        k1, k2 = self.k1, self.k2
        pad = (k1 // 2) + (k2 // 2)
        P = 2 * pad + 1
        nj = len(names)
        ys = []
        for i in range(self.nl):
            x = xs[i]
            B, H, W, C = x.shape
            cls_map = self._run(heads[0][i], x, train)  # dense: drives top-k
            K = min(self.max_det, H * W)
            if 2 * K * k2 * k2 >= H * W or not self._fusable(heads, i):
                reg_maps = [
                    self._run(heads[j][i], x, train) for j in range(1, nj)
                ]
                ys.append(jnp.concatenate([cls_map] + reg_maps, axis=-1))
                continue
            scores = cls_map.max(axis=-1).reshape(B, H * W)
            _, top_idx = jax.lax.top_k(scores, K)  # (B, K)
            yi, xi = top_idx // W, top_idx % W
            xpad = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            Wp = W + 2 * pad
            # padded-coords window rows/cols: center (yi+pad) + d - pad = yi + d
            d = jnp.arange(P)
            rows = yi[:, :, None, None] + d[None, None, :, None]  # (B,K,P,1)
            cols = xi[:, :, None, None] + d[None, None, None, :]  # (B,K,1,P)
            flat = (rows * Wp + cols).reshape(B, K * P * P, 1)
            patches = jnp.take_along_axis(xpad.reshape(B, -1, C), flat, axis=1)
            patches = patches.reshape(B * K, P, P, C)
            xw = patches.dtype

            def affine(conv):
                """Eval BN folded to y = x*a + b (f32 stats math)."""
                v = conv.variables
                sc = v["params"]["bn"]["scale"].astype(jnp.float32)
                bi = v["params"]["bn"]["bias"].astype(jnp.float32)
                mu = v["batch_stats"]["bn"]["mean"].astype(jnp.float32)
                vr = v["batch_stats"]["bn"]["var"].astype(jnp.float32)
                a = sc * jax.lax.rsqrt(vr + BN_EPS)
                return a.astype(xw), (bi - mu * a).astype(xw)

            # conv1 over ALL SEVEN branches as ONE VALID conv on the patch
            # batch: output spatial is exactly the k2 x k2 interior conv2's
            # center needs. Measured 3.7x faster than a hand im2col
            # stack+matmul of the same contraction (tools/exp_sparse_gather.py
            # D vs E) — XLA's conv lowering beats the explicit window
            # materialization on these shapes.
            w1 = jnp.concatenate(
                [
                    heads[j][i][0].variables["params"]["conv"]["kernel"]
                    .astype(xw)
                    for j in range(1, nj)
                ],
                axis=-1,
            )  # (k1, k1, C, sum mid) HWIO
            ab1 = [affine(heads[j][i][0]) for j in range(1, nj)]
            a1 = jnp.concatenate([a for a, _ in ab1])
            b1 = jnp.concatenate([b for _, b in ab1])
            h1 = jax.lax.conv_general_dilated(
                patches, w1, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )  # (B*K, k2, k2, sum mid)
            h1 = apply_act(h1 * a1 + b1, True)
            # dense-border semantics: dense conv2 zero-pads the conv1 OUTPUT
            # map, but the patch conv computes real conv1 values at
            # out-of-map positions (bias/BN make conv1(zeros) != 0). Zero
            # the interior positions that fall outside the feature map so
            # border candidates match the dense forward exactly (review
            # finding: border anchors diverged ~3e-3 vs 1e-6 interior).
            du = jnp.arange(k2) - k2 // 2
            r_ok = (yi[:, :, None] + du >= 0) & (yi[:, :, None] + du < H)
            c_ok = (xi[:, :, None] + du >= 0) & (xi[:, :, None] + du < W)
            inmap = (r_ok[:, :, :, None] & c_ok[:, :, None, :]).reshape(
                B * K, k2, k2, 1
            )
            h1 = jnp.where(inmap, h1, 0)
            mids = [
                heads[j][i][0].variables["params"]["conv"]["kernel"].shape[-1]
                for j in range(1, nj)
            ]
            w2s = [
                heads[j][i][1].variables["params"]["conv"]["kernel"].astype(xw)
                for j in range(1, nj)
            ]
            ab2 = [affine(heads[j][i][1]) for j in range(1, nj)]
            if len(set(mids)) == 1 and len({w.shape[-1] for w in w2s}) == 1:
                # uniform branch widths (the shipped configs): one batched
                # einsum over the branch dim instead of 7 small ones
                g = nj - 1
                h1g = h1.reshape(B * K, k2, k2, g, mids[0])
                z = jnp.einsum("pyxgm,gyxmn->pgn", h1g, jnp.stack(w2s))
                a2 = jnp.stack([a for a, _ in ab2])
                b2 = jnp.stack([b for _, b in ab2])
                h2 = apply_act(z * a2 + b2, True)  # (B*K, g, mid2)
                h2s = [h2[:, j] for j in range(g)]
            else:
                h2s, off = [], 0
                for j in range(1, nj):
                    h = h1[..., off : off + mids[j - 1]]
                    off += mids[j - 1]
                    z = jnp.einsum("pyxm,yxmn->pn", h, w2s[j - 1])
                    a2, b2 = ab2[j - 1]
                    h2s.append(apply_act(z * a2 + b2, True))
            outs = []
            for j in range(1, nj):
                v3 = heads[j][i][2].variables["params"]
                w3 = v3["kernel"].astype(xw).reshape(-1, v3["kernel"].shape[-1])
                outs.append(h2s[j - 1] @ w3 + v3["bias"].astype(xw))
            reg = jnp.concatenate(outs, axis=-1).reshape(B, K, -1)
            # scatter: top_k indices are distinct, so the one-hot sum is exact
            onehot = jax.nn.one_hot(top_idx, H * W, dtype=reg.dtype)
            dense = jnp.einsum("bkl,bkc->blc", onehot, reg).reshape(
                B, H, W, reg.shape[-1]
            )
            ys.append(jnp.concatenate([cls_map, dense], axis=-1))
        # embeddings are a train/distill-only surface (reference eval returns
        # o2o_embs=None, head.py:817)
        return ys, [None] * self.nl

    def __call__(self, xs: Sequence[jax.Array], train: bool = False) -> Dict[str, object]:
        xs = list(xs[: self.nl])
        o2o_heads = [self.cls, self.o2d, self.s2d, self.o3d, self.s3d, self.hd, self.dep, self.dep_un]
        xs_det = [jax.lax.stop_gradient(x) for x in xs]
        # sparse envelope mirrors the reference's (predecessor chaining and
        # the shared common conv need neighborhood outputs; deform offsets
        # can point outside the patch) — shipped 3D configs are all inside it
        use_sparse = (
            self.sparse_eval
            and not train
            and not self.use_predecessors
            and not self.common_head
            and not self.deform
        )
        fwd = self._sparse_forward_feat if use_sparse else self._forward_feat
        one2one, o2o_embs = fwd(xs_det, o2o_heads, train)
        if not train and not self.eval_one2many:
            return {"one2one": one2one, "o2o_embs": o2o_embs}
        one2many, o2m_embs = self._forward_feat(xs, self.o2m_heads, train)
        out = {
            "one2many": one2many,
            "one2one": one2one,
            "o2m_embs": o2m_embs,
            "o2o_embs": o2o_embs,
        }
        if self.fgdm_pred:
            out["depth_maps"] = self.fgdm_predictor(xs, train)
        return out


class DepthPredictor(nn.Module):
    """MonoDETR-style foreground depth-map head (reference head.py:978):
    P3 downsampled + P4 projected + P5 upsampled, fused at P4 resolution with
    GroupNorm(32); two conv+GN+ReLU stages; (D+1)-bin LID depth logits with
    softmax-weighted expected depth."""

    ch: Tuple[int, ...]
    depth_bins: int = 80
    depth_min: float = 1.0
    depth_max: float = 70.0
    hidden: int = 128

    def setup(self):
        import numpy as np

        bin_size = 2 * (self.depth_max - self.depth_min) / (
            self.depth_bins * (1 + self.depth_bins)
        )
        idx = np.arange(self.depth_bins, dtype=np.float32)
        bin_value = (idx + 0.5) ** 2 * bin_size / 2 - bin_size / 8 + self.depth_min
        self.depth_bin_values = jnp.asarray(
            np.concatenate([bin_value, [self.depth_max]]).astype(np.float32)
        )
        d = self.hidden
        gn = lambda: nn.GroupNorm(num_groups=32, epsilon=1e-5)  # torch default (flax is 1e-6)
        self.downsample = [
            nn.Conv(d, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]), gn()
        ]
        self.proj = [_conv1x1(d), gn()]
        self.upsample = [_conv1x1(d), gn()]
        # torch Sequential indices skip the (param-free) ReLUs at 2 and 5
        self.depth_head_0 = nn.Conv(d, (3, 3), padding=[(1, 1), (1, 1)])
        self.depth_head_1 = gn()
        self.depth_head_3 = nn.Conv(d, (3, 3), padding=[(1, 1), (1, 1)])
        self.depth_head_4 = gn()
        self.depth_classifier = _conv1x1(self.depth_bins + 1)

    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        assert len(xs) >= 3
        src_8 = self.downsample[1](self.downsample[0](xs[0]))
        src_16 = self.proj[1](self.proj[0](xs[1]))
        p5 = jax.image.resize(
            xs[2], xs[2].shape[:1] + src_16.shape[1:3] + xs[2].shape[3:], "bilinear"
        )
        src_32 = self.upsample[1](self.upsample[0](p5))
        src = (src_8 + src_16 + src_32) / 3
        src = nn.relu(self.depth_head_1(self.depth_head_0(src)))
        emb = src
        src = nn.relu(self.depth_head_4(self.depth_head_3(src)))
        logits = self.depth_classifier(src)  # (B, H, W, D+1)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        weighted_depth = (probs * self.depth_bin_values).sum(-1)
        return logits, weighted_depth, emb


def detect3d_bias_init(params: dict, nc: int, strides: Sequence[int], rng=None) -> dict:
    """Reference bias init (head.py:847-871): per-scale depth bias 45/25/10,
    cls prior bias for 1280x384 inputs, s2d bias 6, s3d weight std 0.05, dep
    weight uniform in per-scale ranges. Applied to BOTH o2o and o2m copies
    (the reference deep-copies o2m after bias_init, head.py:869-870)."""
    import flax
    import numpy as np

    rng = np.random.default_rng(0) if rng is None else rng
    params = flax.core.unfreeze(params)
    nl = len(strides)
    deps = {1: [40.0], 2: [45.0, 20.0], 3: [45.0, 25.0, 10.0]}[nl]
    ranges = {1: [(-3.5, 3.5)], 2: [(-2, 2), (-2, 2)], 3: [(-2, 2), (-1.5, 1.5), (-1, 1)]}[nl]
    names = list(OUTPUT_CHANNELS.keys())

    def final_key(prefix, name, i):
        # last layer of branch = the 1x1 conv, child index 2 (or 1 if common)
        for li in (2, 1):
            k = f"{prefix}{name}_{i}_{li}"
            if k in params:
                return k
        raise KeyError(f"no final conv for {prefix}{name}_{i}")

    for prefix in ("",):  # o2o only; o2m becomes an exact copy below
        for i, s in enumerate(strides):
            def pkey(name):
                return final_key(prefix, name, i)

            cls_k = pkey("cls")
            b = params[cls_k]["bias"]
            params[cls_k]["bias"] = jnp.full_like(
                b, math.log(5 / nc / ((1280 / s) * (384 / s)))
            )
            params[pkey("s2d")]["bias"] = jnp.full_like(params[pkey("s2d")]["bias"], 6.0)
            for nm in ("o2d", "o3d", "s3d"):
                params[pkey(nm)]["bias"] = jnp.zeros_like(params[pkey(nm)]["bias"])
            w = params[pkey("s3d")]["kernel"]
            params[pkey("s3d")]["kernel"] = jnp.asarray(
                rng.normal(0.0, 0.05, w.shape).astype(np.float32)
            )
            params[pkey("dep")]["bias"] = jnp.full_like(params[pkey("dep")]["bias"], deps[i])
            wd = params[pkey("dep")]["kernel"]
            lo, hi = ranges[i]
            params[pkey("dep")]["kernel"] = jnp.asarray(
                rng.uniform(lo, hi, wd.shape).astype(np.float32)
            )
    # o2m = exact copy of the bias-initialized o2o branches, matching the
    # reference's post-bias_init deepcopy (head.py:869-870) so the dual
    # branches start IDENTICAL (review finding: they started independent)
    import re

    for j, nm in enumerate(names):
        pat = re.compile(rf"^{re.escape(nm)}_(\d+.*)$")
        for k in list(params.keys()):
            m = pat.match(k)
            if m:
                dst = f"o2m_heads_{j}_{m.group(1)}"
                if dst in params:
                    params[dst] = jax.tree.map(jnp.array, params[k])
    return params
