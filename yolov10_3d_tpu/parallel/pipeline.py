"""Pipeline parallelism (pp) for the SAM ViT image encoder.

The scaling-book GPipe recipe, expressed TPU-natively: stages are contiguous
runs of transformer blocks whose parameters live on different devices of a
``pp`` mesh axis (each chip holds ``depth/S`` blocks — the memory lever that
lets a ViT-H encoder, 632 M params, serve from chips that cannot hold it
whole), and microbatches stream through the stages with ``lax.ppermute``
hops over ICI inside one ``shard_map``-ed ``lax.scan``. No NCCL send/recv
process groups (the reference has no pipeline story at all; its SAM encoder
is single-GPU, reference ``modules/sam/encoders.py``) — the schedule is a
single compiled program.

Why the SAM ViT encoder and not the YOLO CNN: pp wants homogeneous stages.
SAM's encoders place their global-attention blocks at a fixed period
(ViT-B depth 12, globals at (2,5,8,11); -L 24/(5,11,17,23); -H 32/
(7,15,23,31)), so any stage count that divides both the depth and the
global period yields stages that are the SAME program — the window/global
pattern repeats per stage — which is exactly the shard_map contract. The
YOLO backbone's stages are heterogeneous (strides, channel widths, skip
routing); its parallel axes are dp/sp/tp (`parallel/mesh.py`).

Fill/drain bubble: S-1 of M+S-1 ticks; efficiency M/(M+S-1). Pick
n_microbatches >= 2*S for >2/3 utilization.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35 stable alias
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def get_mesh_pp(n_stages: int, axis: str = "pp") -> Mesh:
    devs = jax.devices()[:n_stages]
    return Mesh(np.array(devs), (axis,))


def _stage_window_pattern(encoder, n_stages: int) -> List[int]:
    """Per-stage window sizes [ws_0..ws_{k-1}] (0 = global attention).

    Raises unless every stage shares the pattern — the homogeneity condition
    that makes one SPMD program serve all stages."""
    depth = encoder.depth
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    k = depth // n_stages
    ws = [
        0 if i in tuple(encoder.global_attn_indexes) else encoder.window_size
        for i in range(depth)
    ]
    pattern = ws[:k]
    for s in range(1, n_stages):
        if ws[s * k : (s + 1) * k] != pattern:
            raise ValueError(
                f"stage {s} window pattern {ws[s*k:(s+1)*k]} != stage 0 "
                f"{pattern}; pick n_stages dividing the global-attn period"
            )
    return pattern


def _tree_stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *trees)


def prepare_pp_params(encoder, variables, mesh: Mesh, axis: str = "pp"):
    """Split encoder variables into pipeline form and place them:

    Returns ``(stage_params, rest)`` where ``stage_params`` is a k-tuple of
    pytrees each with a leading ``(S, ...)`` stage axis sharded over ``axis``
    (j-th entry = the j-th block of every stage — blocks at the same stage
    offset share shapes, unlike window-vs-global siblings), and ``rest`` is
    the replicated patch_embed/pos_embed/neck subtree."""
    S = int(mesh.shape[axis])
    k = encoder.depth // S
    params = variables["params"]
    stage_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    stage_params = tuple(
        jax.device_put(
            _tree_stack([params[f"blocks_{s * k + j}"] for s in range(S)]),
            stage_sh,
        )
        for j in range(k)
    )
    rest = {
        name: sub for name, sub in params.items() if not name.startswith("blocks_")
    }
    rest = jax.device_put(rest, rep)
    return stage_params, rest


def make_pp_encoder(
    encoder,
    mesh: Mesh,
    n_microbatches: int = 4,
    axis: str = "pp",
):
    """Build ``fn(stage_params, rest, x) -> (B, G, G, out_chans)`` — the
    pipelined equivalent of ``encoder.apply(variables, x)``.

    ``x`` is the NHWC image batch; B must be divisible by n_microbatches.
    Patch-embed + pos-embed and the neck run replicated (their FLOPs are
    negligible next to the blocks); the block stack runs as an S-stage
    ppermute pipeline."""
    from ..models.sam.encoders import ViTBlock, layer_norm_2d  # noqa: F401
    import flax.linen as nn

    S = int(mesh.shape[axis])
    M = n_microbatches
    grid = encoder.img_size // encoder.patch_size
    pattern = _stage_window_pattern(encoder, S)
    blocks = [
        ViTBlock(
            dim=encoder.embed_dim,
            num_heads=encoder.num_heads,
            mlp_ratio=encoder.mlp_ratio,
            use_rel_pos=encoder.use_rel_pos,
            window_size=ws,
            input_size=(grid, grid),
        )
        for ws in pattern
    ]
    perm = [(i, i + 1) for i in range(S - 1)]

    def stage_fn(stage_local, h):
        for blk, p in zip(blocks, stage_local):
            h = blk.apply({"params": p}, h)
        return h

    def pipeline(stage_params, x_mb):
        # shard_map body: stage_params leaves are the LOCAL (1, ...) slices
        local = jax.tree.map(lambda a: a[0], stage_params)
        idx = jax.lax.axis_index(axis)
        out0 = jnp.zeros_like(x_mb)
        buf0 = jnp.zeros_like(x_mb[0])

        def tick(carry, t):
            buf, out = carry
            xin = jax.lax.dynamic_index_in_dim(
                x_mb, jnp.clip(t, 0, M - 1), keepdims=False
            )
            buf = jnp.where(idx == 0, xin, buf)
            y = stage_fn(local, buf)
            m = jnp.clip(t - (S - 1), 0, M - 1)
            valid = (idx == S - 1) & (t >= S - 1)
            prev = jax.lax.dynamic_index_in_dim(out, m, keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(valid, y, prev), m, 0
            )
            nxt = jax.lax.ppermute(y, axis, perm) if S > 1 else y
            return (buf if S == 1 else nxt, out), None

        (_, out), _ = jax.lax.scan(
            tick, (buf0, out0), jnp.arange(M + S - 1)
        )
        # only the last stage wrote real values; psum replicates them
        return jax.lax.psum(out, axis) if S > 1 else out

    try:
        smapped = _shard_map(
            pipeline, mesh=mesh, in_specs=(P(axis), P()), out_specs=P(),
            check_vma=False,
        )
    except TypeError:  # pragma: no cover - older jax spells it check_rep
        smapped = _shard_map(
            pipeline, mesh=mesh, in_specs=(P(axis), P()), out_specs=P(),
            check_rep=False,
        )

    @jax.jit
    def fn(stage_params, rest, x):
        B = x.shape[0]
        xe = nn.Conv(
            encoder.embed_dim,
            kernel_size=(encoder.patch_size, encoder.patch_size),
            strides=(encoder.patch_size, encoder.patch_size),
            padding="VALID",
        ).apply({"params": rest["patch_embed"]["proj"]}, x)
        xe = xe + rest["pos_embed"]
        x_mb = xe.reshape(M, B // M, grid, grid, encoder.embed_dim)
        h = smapped(stage_params, x_mb)
        h = h.reshape(B, grid, grid, encoder.embed_dim)
        # neck: 1x1 -> LN2d -> 3x3 -> LN2d (encoders.py:204-210)
        h = nn.Conv(encoder.out_chans, (1, 1), use_bias=False).apply(
            {"params": rest["neck_0"]}, h
        )
        h = _ln2d_apply(rest["neck_1"], h)
        h = nn.Conv(
            encoder.out_chans, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False
        ).apply({"params": rest["neck_2"]}, h)
        return _ln2d_apply(rest["neck_3"], h)

    return fn


def _ln2d_apply(p, x):
    """encoders.layer_norm_2d with explicit params (eps 1e-6)."""
    import flax.linen as nn

    return nn.LayerNorm(epsilon=1e-6).apply({"params": p}, x)
