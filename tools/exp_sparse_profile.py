#!/usr/bin/env python
"""Per-op attribution of the sparse 3D eval path (heads3d._sparse_forward_feat).

The fused im2col rewrite only moved the end-to-end from 63.1 -> 61.9 ms at
B=64 (tools/exp_sparse_infer3d.py) despite removing ~2500 GFLOP of dense
branch work — so ~28 ms of the sparse path is NOT the patch matmuls. This
times each component standalone on the real chip at the exact shapes the
B=64 384x1280 yolov10s-3D eval uses, to find where those ms actually go.

Components per scale (C = head input channels, HW = anchor count):
  top_k      exact lax.top_k over (B, HW) max-class scores (suspect: TPU
             top_k lowers to a full sort)
  approx     jax.lax.approx_max_k comparison point
  gather     pad + row-gather of (B, K*P*P, C) patches
  im2col+mm  stack 9 interior windows + one (B*K*9, 9C)@(9C, 896) matmul
  conv2+1x1  batched einsum over 7 branches + 7 tiny matmuls
  scatter    one_hot + einsum back to the (B, H, W, 33) map
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from tools._bench_util import timed  # noqa: E402

B, K = 64, 50
SCALES = [  # (H, W, C) for yolov10s-3D at 384x1280
    (48, 160, 128),
    (24, 80, 256),
    (12, 40, 512),
]
K1 = K2 = 3
PAD = 2
P = 5


def main():
    rng = np.random.default_rng(0)
    total = {}
    for H, W, C in SCALES:
        HW = H * W
        x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        cls = jnp.asarray(
            rng.normal(size=(B, HW)).astype(np.float32)
        )

        topk = jax.jit(lambda s: jax.lax.top_k(s, K)[1].sum())
        t_topk = timed(topk, cls)

        apprx = jax.jit(lambda s: jax.lax.approx_max_k(s, K)[1].sum())
        t_apprx = timed(apprx, cls)

        idx = jnp.asarray(rng.integers(0, HW, (B, K)), jnp.int32)

        @jax.jit
        def gather(x, idx):
            yi, xi = idx // W, idx % W
            xpad = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
            Wp = W + 2 * PAD
            d = jnp.arange(P)
            rows = yi[:, :, None, None] + d[None, None, :, None]
            colsx = xi[:, :, None, None] + d[None, None, None, :]
            flat = (rows * Wp + colsx).reshape(B, K * P * P, 1)
            patches = jnp.take_along_axis(xpad.reshape(B, -1, C), flat, axis=1)
            return patches.astype(jnp.float32).sum(), patches

        t_gather = timed(gather, x, idx)
        patches = gather(x, idx)[1].reshape(B * K, P, P, C)

        w1 = jnp.asarray(
            rng.normal(size=(9 * C, 7 * 128)).astype(np.float32)
        ).astype(jnp.bfloat16)

        @jax.jit
        def im2col_mm(p, w1):
            colx = jnp.stack(
                [
                    p[:, u : u + K1, v : v + K1, :]
                    for u in range(K2)
                    for v in range(K2)
                ],
                axis=1,
            ).reshape(B * K * 9, 9 * C)
            h = jax.nn.silu(colx @ w1)
            return h.astype(jnp.float32).sum(), h

        t_mm = timed(im2col_mm, patches, w1)
        h1 = im2col_mm(patches, w1)[1].reshape(B * K, K2, K2, 7, 128)

        w2 = jnp.asarray(
            rng.normal(size=(7, 3, 3, 128, 128)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w3 = [
            jnp.asarray(rng.normal(size=(128, o)).astype(np.float32)).astype(
                jnp.bfloat16
            )
            for o in (2, 2, 2, 3, 24, 1, 1)
        ]

        @jax.jit
        def conv2_1x1(h1, w2):
            z = jax.nn.silu(jnp.einsum("pyxgm,gyxmn->pgn", h1, w2))
            outs = [z[:, j] @ w3[j] for j in range(7)]
            r = jnp.concatenate(outs, -1)
            return r.astype(jnp.float32).sum(), r

        t_c2 = timed(conv2_1x1, h1, w2)
        reg = conv2_1x1(h1, w2)[1].reshape(B, K, -1)

        @jax.jit
        def scatter(idx, reg):
            onehot = jax.nn.one_hot(idx, HW, dtype=reg.dtype)
            d = jnp.einsum("bkl,bkc->blc", onehot, reg)
            return d.astype(jnp.float32).sum(), d

        t_sc = timed(scatter, idx, reg)

        row = dict(
            top_k=t_topk, approx=t_apprx, gather=t_gather,
            im2col_mm=t_mm, conv2_1x1=t_c2, scatter=t_sc,
        )
        print(
            f"scale {H}x{W} C={C}: "
            + "  ".join(f"{k}={v*1e3:6.2f}ms" for k, v in row.items()),
            flush=True,
        )
        for k, v in row.items():
            total[k] = total.get(k, 0.0) + v
    print(
        "TOTAL (3 scales): "
        + "  ".join(f"{k}={v*1e3:6.2f}ms" for k, v in total.items())
    )


if __name__ == "__main__":
    main()
