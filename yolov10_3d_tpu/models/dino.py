"""DINOv2 depth teacher, in-repo (reference: ultralytics/utils/dino.py
``DinoDepther`` — torch-hub DINOv2 ViT backbone + a KITTI linear depth head,
used as the frozen teacher for 3D depth distillation, loss.py:1138).

The reference can only construct its teacher online (torch.hub + mmcv config
fetch). This module carries the full architecture natively — a flax DINOv2
ViT (patch 14, cls token, LayerScale, interpolated pos-embed,
``get_intermediate_layers``) plus the linear ConvHead — and a state_dict
converter keyed to the public ``dinov2_vits14`` naming, so real weights plug
in the moment a checkpoint lands on disk; until then a seeded random teacher
exercises the identical code path (distillation plumbing is weight-agnostic).

Teacher contract (train/distill.py): ``teacher(imgs) -> (depth_maps,
embeddings)`` with imgs (B, H, W, 3) float 0..1 NHWC, depth_maps (B, H, W),
embeddings (B, Hp, Wp, Ct).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torch-hub dinov2 configs (reference dino.py:98-104 backbone_archs)
DINOV2_ARCHS = {
    "small": dict(embed_dim=384, depth=12, num_heads=6),
    "base": dict(embed_dim=768, depth=12, num_heads=12),
    "large": dict(embed_dim=1024, depth=24, num_heads=16),
    "giant": dict(embed_dim=1536, depth=40, num_heads=24),
}


class _Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, N, C = x.shape
        hd = C // self.num_heads
        qkv = nn.Dense(3 * C, name="qkv")(x).reshape(B, N, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        return nn.Dense(C, name="proj")(y)


class _LayerScale(nn.Module):
    dim: int
    init: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param(
            "gamma", lambda _, s: jnp.full(s, self.init, jnp.float32), (self.dim,)
        )
        return x * gamma


class _Block(nn.Module):
    """DINOv2 pre-norm block: x += ls1*attn(norm1 x); x += ls2*mlp(norm2 x)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = x + _LayerScale(self.dim, name="ls1")(
            _Attention(self.dim, self.num_heads, name="attn")(y)
        )
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(y)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="mlp_fc2")(h)
        return x + _LayerScale(self.dim, name="ls2")(h)


class DinoV2ViT(nn.Module):
    """DINOv2 ViT backbone (patch 14). ``__call__`` returns the selected
    intermediate layers reshaped to (B, Hp, Wp, C) — the
    ``get_intermediate_layers(n, reshape=True, norm=True)`` surface the
    reference teacher wires into its depth head (dino.py:52-57)."""

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 14
    mlp_ratio: float = 4.0
    pretrain_grid: int = 37  # 518/14: the grid pos_embed was trained at

    @nn.compact
    def __call__(
        self, x: jax.Array, out_indices: Sequence[int] = (2, 5, 8, 11)
    ) -> Tuple[jax.Array, ...]:
        B, H, W, _ = x.shape
        hp, wp = H // self.patch_size, W // self.patch_size
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            name="patch_embed_proj",
        )(x).reshape(B, hp * wp, self.embed_dim)

        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.embed_dim)
        )
        g = self.pretrain_grid
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, g * g + 1, self.embed_dim)
        )
        # interpolate the patch pos-embed to this input's grid (DINOv2
        # interpolate_pos_encoding; bilinear stands in for bicubic)
        patch_pos = jax.image.resize(
            pos[:, 1:].reshape(1, g, g, self.embed_dim),
            (1, hp, wp, self.embed_dim),
            "bilinear",
        ).reshape(1, hp * wp, self.embed_dim)
        x = x + patch_pos
        x = jnp.concatenate([jnp.broadcast_to(cls + pos[:, :1], (B, 1, self.embed_dim)), x], 1)

        outs = []
        want = set(int(i) for i in out_indices)
        for i in range(self.depth):
            x = _Block(self.embed_dim, self.num_heads, self.mlp_ratio, name=f"blocks_{i}")(x)
            if i in want:
                outs.append(x)
        final_norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        # norm=True semantics: the final LayerNorm is applied to every
        # returned intermediate; drop the cls token, reshape to maps
        return tuple(
            final_norm(o)[:, 1:].reshape(B, hp, wp, self.embed_dim) for o in outs
        )


class DinoDepthHead(nn.Module):
    """Linear ConvHead (the reference rewrites BNHead->ConvHead,
    classify=False, dino.py:83-84): BN over the concatenated intermediates,
    1x1 conv to 1 channel, ReLU (depth is nonnegative metric meters)."""

    @nn.compact
    def __call__(
        self, feats: Tuple[jax.Array, ...], train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        f = jnp.concatenate(feats, axis=-1)  # (B, Hp, Wp, 4C) = the embeddings
        h = nn.BatchNorm(use_running_average=not train, name="bn")(f)
        d = nn.Conv(1, (1, 1), name="conv_depth")(h)
        return nn.relu(d[..., 0]), f


class DinoDepther(nn.Module):
    """Backbone + head; mirrors the reference teacher's forward contract
    (dino.py:128-133): normalize/resize happens in ``make_dino_teacher``."""

    backbone_size: str = "small"
    out_indices: Sequence[int] = (2, 5, 8, 11)
    arch_override: Optional[Dict[str, int]] = None  # custom widths (tests,
    # student-matched embedding dims)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        arch = dict(DINOV2_ARCHS[self.backbone_size], **(self.arch_override or {}))
        feats = DinoV2ViT(**arch, name="backbone")(x, out_indices=self.out_indices)
        return DinoDepthHead(name="head")(feats, train=train)


# ImageNet normalization, the reference's transform_imgs constants
# (dino.py:114-117; they scale 0..1 imgs by 255 then normalize)
_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_STD = np.array([58.395, 57.12, 57.375], np.float32)


def make_dino_teacher(variables=None, backbone_size: str = "small",
                      out_indices: Sequence[int] = (2, 5, 8, 11), seed: int = 0,
                      arch_override: Optional[Dict[str, int]] = None):
    """Build the frozen teacher callable ``imgs -> (depth_maps, embeddings)``.

    ``variables=None`` initializes random weights (architecture-exact
    plumbing without a checkpoint — the offline stand-in); pass converted
    real weights (``convert_dinov2_state_dict``) when available.
    ``arch_override`` adjusts widths/depth (e.g. ``{"embed_dim": 128}`` to
    match a student head's embedding dimension, or tiny configs in tests)."""
    model = DinoDepther(backbone_size=backbone_size, out_indices=out_indices,
                        arch_override=arch_override)
    if variables is None:
        x0 = jnp.zeros((1, 224, 224, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(seed), x0)

    @jax.jit
    def teacher(imgs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        B, H, W, _ = imgs.shape
        h14, w14 = H - H % 14, W - W % 14
        x = (imgs * 255.0 - _MEAN) / _STD
        x = jax.image.resize(x, (B, h14, w14, 3), "bilinear")
        depth, emb = model.apply(variables, x)
        depth = jax.image.resize(depth[..., None], (B, H, W, 1), "bilinear")[..., 0]
        return jax.lax.stop_gradient(depth), jax.lax.stop_gradient(emb)

    return teacher


def convert_dinov2_state_dict(sd: Dict[str, np.ndarray], backbone_size: str = "small"):
    """Public ``dinov2_vitX14`` state_dict -> ``DinoV2ViT`` params subtree.

    Key map (torch -> flax):
      cls_token / pos_embed                  -> verbatim leaves
      patch_embed.proj.{weight,bias}         -> patch_embed_proj (OIHW->HWIO)
      blocks.N.norm{1,2}.{weight,bias}       -> blocks_N/norm{1,2}/{scale,bias}
      blocks.N.attn.qkv / attn.proj          -> blocks_N/attn/{qkv,proj} (T)
      blocks.N.ls{1,2}.gamma                 -> blocks_N/ls{1,2}/gamma
      blocks.N.mlp.fc{1,2}                   -> blocks_N/mlp_fc{1,2} (T)
      norm.{weight,bias}                     -> norm/{scale,bias}
    """
    arch = DINOV2_ARCHS[backbone_size]
    p: Dict[str, object] = {}

    def dense(prefix):
        return {
            "kernel": np.asarray(sd[prefix + ".weight"]).T,
            "bias": np.asarray(sd[prefix + ".bias"]),
        }

    def ln(prefix):
        return {
            "scale": np.asarray(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"]),
        }

    p["cls_token"] = np.asarray(sd["cls_token"])
    p["pos_embed"] = np.asarray(sd["pos_embed"])
    p["patch_embed_proj"] = {
        "kernel": np.asarray(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
        "bias": np.asarray(sd["patch_embed.proj.bias"]),
    }
    for i in range(arch["depth"]):
        t = f"blocks.{i}"
        p[f"blocks_{i}"] = {
            "norm1": ln(f"{t}.norm1"),
            "norm2": ln(f"{t}.norm2"),
            "attn": {"qkv": dense(f"{t}.attn.qkv"), "proj": dense(f"{t}.attn.proj")},
            "ls1": {"gamma": np.asarray(sd[f"{t}.ls1.gamma"])},
            "ls2": {"gamma": np.asarray(sd[f"{t}.ls2.gamma"])},
            "mlp_fc1": dense(f"{t}.mlp.fc1"),
            "mlp_fc2": dense(f"{t}.mlp.fc2"),
        }
    p["norm"] = ln("norm")
    return p


def export_dinov2_state_dict(variables, backbone_size: str = "small"):
    """Inverse of ``convert_dinov2_state_dict`` PLUS the head: DinoDepther
    variables -> the reference ``DinoDepther.save()`` layout (torch-named
    flat dict: ``backbone.*`` public dinov2 keys + ``head.*`` ConvHead keys,
    dino.py:137-138). Saved as .npz this round-trips through
    ``Detection3DTrainer._load_dino_teacher`` / the ``dino_path`` cfg key."""
    p = jax.device_get(variables["params"])
    bs = jax.device_get(variables.get("batch_stats", {}))
    b = p["backbone"]
    # depth from the params tree (robust to arch_override'd test configs)
    depth = sum(1 for k in b if str(k).startswith("blocks_"))
    sd = {
        "backbone.cls_token": b["cls_token"],
        "backbone.pos_embed": b["pos_embed"],
        "backbone.patch_embed.proj.weight":
            np.asarray(b["patch_embed_proj"]["kernel"]).transpose(3, 2, 0, 1),
        "backbone.patch_embed.proj.bias": b["patch_embed_proj"]["bias"],
        "backbone.norm.weight": b["norm"]["scale"],
        "backbone.norm.bias": b["norm"]["bias"],
    }
    for i in range(depth):
        blk, t = b[f"blocks_{i}"], f"backbone.blocks.{i}"
        for ln in ("norm1", "norm2"):
            sd[f"{t}.{ln}.weight"] = blk[ln]["scale"]
            sd[f"{t}.{ln}.bias"] = blk[ln]["bias"]
        for src, dst in (("qkv", "attn.qkv"), ("proj", "attn.proj")):
            sd[f"{t}.{dst}.weight"] = np.asarray(blk["attn"][src]["kernel"]).T
            sd[f"{t}.{dst}.bias"] = blk["attn"][src]["bias"]
        sd[f"{t}.ls1.gamma"] = blk["ls1"]["gamma"]
        sd[f"{t}.ls2.gamma"] = blk["ls2"]["gamma"]
        sd[f"{t}.mlp.fc1.weight"] = np.asarray(blk["mlp_fc1"]["kernel"]).T
        sd[f"{t}.mlp.fc1.bias"] = blk["mlp_fc1"]["bias"]
        sd[f"{t}.mlp.fc2.weight"] = np.asarray(blk["mlp_fc2"]["kernel"]).T
        sd[f"{t}.mlp.fc2.bias"] = blk["mlp_fc2"]["bias"]
    h = p["head"]
    sd["head.conv_depth.weight"] = np.asarray(h["conv_depth"]["kernel"]).transpose(3, 2, 0, 1)
    sd["head.conv_depth.bias"] = h["conv_depth"]["bias"]
    sd["head.bn.weight"] = h["bn"]["scale"]
    sd["head.bn.bias"] = h["bn"]["bias"]
    sd["head.bn.running_mean"] = bs["head"]["bn"]["mean"]
    sd["head.bn.running_var"] = bs["head"]["bn"]["var"]
    return {k: np.asarray(v) for k, v in sd.items()}


def train_dino_teacher(
    train_ds, save_path, val_ds=None, *, backbone_size: str = "small",
    arch_override=None, epochs: int = 200, batch_size: int = 24,
    lr: float = 1e-5, end_factor: float = 0.1, schedule_iters: int = 200,
    seed: int = 0, num_threads: int = 2, log=None,
):
    """Train the DINOv2 depth teacher on KITTI foreground depth maps — the
    TPU-native equivalent of the reference's standalone teacher trainer
    (/root/reference/ultralytics/utils/dino.py:223-298 ``train_one_epoch`` /
    ``main``): Adam(lr 1e-5) + per-epoch LinearLR 1.0 -> 0.1 over
    ``schedule_iters`` epochs, smooth-L1 on the pixels where the composited
    per-object depth map is foreground (``get_depth_map_loss``), best
    checkpoint by val loss saved in the reference ``.save()`` layout (as
    .npz) so it loads straight back through the ``dino_path`` cfg key.

    ``train_ds``/``val_ds``: datasets yielding {"img" (H,W,3 uint8/float),
    "depth_map" (H,W)} — e.g. KITTIDataset(args.load_depth_maps=True).
    Returns (save_path, [train_loss/epoch], [val_loss/epoch])."""
    import optax

    from ..data.dataset import DataLoader

    model = DinoDepther(backbone_size=backbone_size, arch_override=arch_override)
    sample = train_ds[0]
    H, W = sample["depth_map"].shape
    h14, w14 = H - H % 14, W - W % 14

    def prep(img):
        x = img.astype(jnp.float32)
        x = jnp.where(jnp.max(x) > 2.0, x / 255.0, x)  # uint8-origin guard
        x = x * 255.0 - jnp.asarray(_MEAN)
        x = x / jnp.asarray(_STD)
        return jax.image.resize(x, (x.shape[0], h14, w14, 3), "bilinear")

    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(seed), jnp.zeros((1, h14, w14, 3), jnp.float32),
        train=True,
    )
    # reference: per-EPOCH LinearLR step (scheduler.step() once per epoch)
    steps_per_epoch = max(1, (len(train_ds) + batch_size - 1) // batch_size)

    def lr_fn(step):
        e = jnp.minimum(step // steps_per_epoch, schedule_iters)
        return lr * (1.0 + (end_factor - 1.0) * e / schedule_iters)

    tx = optax.adam(learning_rate=lr_fn)
    opt_state = tx.init(variables["params"])

    def loss_of(params, batch_stats, imgs, depth_gt, train):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, prep(imgs),
            train=train, mutable=["batch_stats"] if train else [],
        ) if train else (
            model.apply({"params": params, "batch_stats": batch_stats},
                        prep(imgs), train=False),
            {"batch_stats": batch_stats},
        )
        pred = out[0]
        pred = jax.image.resize(pred[..., None], (pred.shape[0], H, W, 1),
                                "bilinear")[..., 0]
        mask = depth_gt > 0
        l = optax.huber_loss(pred, depth_gt, delta=1.0)  # == smooth_l1 (beta 1)
        loss = jnp.sum(jnp.where(mask, l, 0.0)) / jnp.maximum(mask.sum(), 1)
        return loss, mut["batch_stats"]

    @jax.jit
    def train_step(params, batch_stats, opt_state, imgs, depth_gt):
        (loss, new_bs), grads = jax.value_and_grad(
            lambda p: loss_of(p, batch_stats, imgs, depth_gt, True),
            has_aux=True,
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    @jax.jit
    def val_step(params, batch_stats, imgs, depth_gt):
        return loss_of(params, batch_stats, imgs, depth_gt, False)[0]

    params, batch_stats = variables["params"], variables["batch_stats"]
    log = log or (lambda *_: None)
    tl_hist, vl_hist = [], []
    best, best_val = None, float("inf")
    for epoch in range(epochs):
        loader = DataLoader(train_ds, batch_size, shuffle=True,
                            seed=seed + epoch, num_threads=num_threads,
                            drop_last=False)
        tot = n = 0.0
        for b in loader:
            imgs = jnp.asarray(np.asarray(b["img"]))
            dm = jnp.asarray(np.asarray(b["depth_map"], np.float32))
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, imgs, dm
            )
            tot += float(loss); n += 1
        tl = tot / max(n, 1)
        tl_hist.append(tl)
        if val_ds is not None:
            vloader = DataLoader(val_ds, batch_size, shuffle=False,
                                 num_threads=num_threads, drop_last=False)
            vt = vn = 0.0
            for b in vloader:
                vl = val_step(params, batch_stats,
                              jnp.asarray(np.asarray(b["img"])),
                              jnp.asarray(np.asarray(b["depth_map"], np.float32)))
                vt += float(vl); vn += 1
            vl = vt / max(vn, 1)
        else:
            vl = tl
        vl_hist.append(vl)
        log(epoch, tl, vl)
        if vl < best_val:  # reference: best.pt by eval loss (dino.py:288-291)
            best_val = vl
            best = export_dinov2_state_dict(
                {"params": params, "batch_stats": batch_stats}, backbone_size
            )
    save_path = str(save_path)
    np.savez(save_path, **best)
    return save_path, tl_hist, vl_hist
