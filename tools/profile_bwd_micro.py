#!/usr/bin/env python
"""Microbench half of profile_bwd.py (split out: the full run exceeds a 10-min
budget through the tunnel). Grad-vs-fwd cost per layer type for the TPU
backward suspects: depthwise k3/k7, dense k3 s1, 1x1, and the stride-2
transitions whose input-grad XLA lowers to an lhs-dilated conv."""

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.devices()

import flax.linen as nn  # noqa: E402

from _bench_util import timed  # noqa: E402

B = 64


def gnorm(g):
    return sum(jnp.sum(t.astype(jnp.float32) ** 2) for t in jax.tree.leaves(g))


def chain_bench(name, mk_layer, shape, n=8):
    class Chain(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(n):
                x = mk_layer(i)(x)
            return x

    m = Chain()
    x = jnp.ones(shape, jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x)
    v = jax.tree.map(lambda t: t.astype(jnp.bfloat16), v)

    fwd = jax.jit(lambda v, x: m.apply(v, x).astype(jnp.float32).sum())
    grd = jax.jit(lambda v, x: gnorm(jax.grad(
        lambda p: m.apply(p, x).astype(jnp.float32).sum())(v)))
    tf = timed(fwd, v, x)
    tg = timed(grd, v, x)
    print(f"{name:34s} fwd {tf*1e3/n:7.2f} ms/layer   "
          f"fwd+bwd {tg*1e3/n:7.2f} ms/layer  (bwd/fwd {tg/tf:4.1f}x)",
          flush=True)


def s2_chain_bench(name, feat, k, groups, shape, n=6):
    """Stride-2 chain: alternate s2 downsample with a 1x1 channel-halving
    conv so spatial dims shrink then get re-expanded is impossible — instead
    use s2 then upsample-by-repeat to keep shapes constant per pair."""
    class Chain(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(n):
                x = nn.Conv(feat, (k, k), strides=(2, 2), padding="SAME",
                            feature_group_count=groups, use_bias=False,
                            dtype=jnp.bfloat16, name=f"s2_{i}")(x)
                x = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)  # keep HW constant
            return x

    m = Chain()
    x = jnp.ones(shape, jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x)
    v = jax.tree.map(lambda t: t.astype(jnp.bfloat16), v)
    fwd = jax.jit(lambda v, x: m.apply(v, x).astype(jnp.float32).sum())
    grd = jax.jit(lambda v, x: gnorm(jax.grad(
        lambda p: m.apply(p, x).astype(jnp.float32).sum())(v)))
    tf = timed(fwd, v, x)
    tg = timed(grd, v, x)
    print(f"{name:34s} fwd {tf*1e3/n:7.2f} ms/layer   "
          f"fwd+bwd {tg*1e3/n:7.2f} ms/layer  (bwd/fwd {tg/tf:4.1f}x)",
          flush=True)


def main():
    C = 256
    chain_bench(
        "DWConv k3 @40x40x512",
        lambda i: nn.Conv(512, (3, 3), padding="SAME", feature_group_count=512,
                          use_bias=False, dtype=jnp.bfloat16, name=f"dw{i}"),
        (B, 40, 40, 512),
    )
    chain_bench(
        "DWConv k7 @20x20x512 (RepVGGDW)",
        lambda i: nn.Conv(512, (7, 7), padding="SAME", feature_group_count=512,
                          use_bias=False, dtype=jnp.bfloat16, name=f"dw7{i}"),
        (B, 20, 20, 512),
    )
    chain_bench(
        f"Conv k3 s1 @80x80x{C}",
        lambda i: nn.Conv(C, (3, 3), padding="SAME", use_bias=False,
                          dtype=jnp.bfloat16, name=f"c{i}"),
        (B, 80, 80, C),
    )
    chain_bench(
        "Conv k1 @80x80x256",
        lambda i: nn.Conv(256, (1, 1), use_bias=False, dtype=jnp.bfloat16,
                          name=f"p{i}"),
        (B, 80, 80, 256),
    )
    s2_chain_bench("Conv k3 s2 @80x80x128 (downsample)", 128, 3, 1,
                   (B, 80, 80, 128))
    s2_chain_bench("DWConv k3 s2 @40x40x512 (SCDown)", 512, 3, 512,
                   (B, 40, 40, 512))


if __name__ == "__main__":
    main()
