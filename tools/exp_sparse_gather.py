#!/usr/bin/env python
"""Gather + conv1 strategy shootout for the sparse 3D eval path.

exp_sparse_profile.py showed the machinery is gather-bound (4.8 ms for
~143 MB = 30 GB/s — slice-COUNT-bound: 80k tiny (1,C) row gathers) plus an
im2col matmul running at 53 TF/s. Variants measured here at the B=64
384x1280 shapes:

gather:
  A. row gather     take_along_axis, (1,C) slices, K*P*P per image (current)
  B. block gather   lax.gather of (P,C)-contiguous blocks, K*P per image
  C. row+window     gather K*P full-width rows then a second within-row
                    block gather

conv1:
  D. stack+matmul   9 interior windows stacked then one big matmul (current)
  E. VALID conv     lax.conv on the (B*K, P, P, C) patch batch, fused 896-ch
                    kernel, VALID padding (9 output positions, no waste)
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from tools._bench_util import timed  # noqa: E402

B, K = 64, 50
SCALES = [(48, 160, 128), (24, 80, 256), (12, 40, 512)]
K1 = K2 = 3
PAD = 2
P = 5


def main():
    rng = np.random.default_rng(0)
    tot = {}
    for H, W, C in SCALES:
        x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        idx = jnp.asarray(rng.integers(0, H * W, (B, K)), jnp.int32)

        @jax.jit
        def g_rows(x, idx):
            yi, xi = idx // W, idx % W
            xpad = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
            Wp = W + 2 * PAD
            d = jnp.arange(P)
            rows = yi[:, :, None, None] + d[None, None, :, None]
            cols = xi[:, :, None, None] + d[None, None, None, :]
            flat = (rows * Wp + cols).reshape(B, K * P * P, 1)
            p = jnp.take_along_axis(xpad.reshape(B, -1, C), flat, axis=1)
            return p.astype(jnp.float32).sum(), p.reshape(B * K, P, P, C)

        @jax.jit
        def g_blocks(x, idx):
            yi, xi = idx // W, idx % W
            xpad = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
            Wp = W + 2 * PAD
            d = jnp.arange(P)
            # one (P*C)-contiguous block per (candidate, patch-row):
            # operand (B, Hp, Wp*C), starts (row, col*C), slice (1, P*C)
            rows = (yi[:, :, None] + d[None, None, :]).reshape(B, K * P)
            cols = jnp.broadcast_to((xi * C)[:, :, None], (B, K, P)).reshape(B, K * P)
            starts = jnp.stack([rows, cols], axis=-1)  # (B, K*P, 2)
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2),
                collapsed_slice_dims=(),
                start_index_map=(0, 1),
            )
            p = jax.vmap(
                lambda op, st: jax.lax.gather(
                    op, st, dn, slice_sizes=(1, P * C),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                )
            )(xpad.reshape(B, H + 2 * PAD, Wp * C), starts)
            return p.astype(jnp.float32).sum(), p.reshape(B * K, P, P, C)

        @jax.jit
        def g_rowfirst(x, idx):
            yi, xi = idx // W, idx % W
            xpad = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
            Wp = W + 2 * PAD
            d = jnp.arange(P)
            rows = (yi[:, :, None] + d[None, None, :]).reshape(B, K * P, 1)
            full = jnp.take_along_axis(
                xpad.reshape(B, -1, Wp * C), rows, axis=1
            )  # (B, K*P, Wp*C)
            cols = jnp.broadcast_to((xi * C)[:, :, None], (B, K, P)).reshape(
                B, K * P, 1
            )
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(2,), collapsed_slice_dims=(), start_index_map=(1,),
            )
            # within-row window: per (b, kp) start col, slice P*C
            p = jax.vmap(
                jax.vmap(
                    lambda row, st: jax.lax.dynamic_slice(row, (st[0],), (P * C,))
                )
            )(full, cols)
            return p.astype(jnp.float32).sum(), p.reshape(B * K, P, P, C)

        res = {}
        res["A_rows"] = timed(g_rows, x, idx)
        try:
            res["B_blocks"] = timed(g_blocks, x, idx)
        except Exception as e:
            print("B_blocks failed:", type(e).__name__, str(e)[:200])

        patches = g_rows(x, idx)[1]
        w1 = jnp.asarray(
            rng.normal(size=(K1, K1, C, 7 * 128)).astype(np.float32)
        ).astype(jnp.bfloat16)

        @jax.jit
        def c_stackmm(p, w1):
            colx = jnp.stack(
                [
                    p[:, u : u + K1, v : v + K1, :]
                    for u in range(K2)
                    for v in range(K2)
                ],
                axis=1,
            ).reshape(B * K * 9, K1 * K1 * C)
            h = jax.nn.silu(colx @ w1.reshape(K1 * K1 * C, -1))
            return h.astype(jnp.float32).sum(), h

        @jax.jit
        def c_valid(p, w1):
            h = jax.lax.conv_general_dilated(
                p, w1, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            h = jax.nn.silu(h)
            return h.astype(jnp.float32).sum(), h

        res["D_stackmm"] = timed(c_stackmm, patches, w1)
        res["E_validconv"] = timed(c_valid, patches, w1)

        print(
            f"scale {H}x{W} C={C}: "
            + "  ".join(f"{k}={v*1e3:6.2f}ms" for k, v in res.items()),
            flush=True,
        )
        for k, v in res.items():
            tot[k] = tot.get(k, 0.0) + v
    print("TOTAL: " + "  ".join(f"{k}={v*1e3:6.2f}ms" for k, v in tot.items()))


if __name__ == "__main__":
    main()
