#!/usr/bin/env python
"""K2/K3 block-size tuning probe at the serving batch (B=128).

The --quick campaign showed the Pallas int8 1x1 kernel at 145 GB/s on the
bandwidth-bound 80x80x128 shape where XLA bf16 sits at the HBM roof
(~893 GB/s counted bytes). If int8 IO is to win there, the kernel must also
reach the roof — halving bytes only pays if achieved GB/s holds. This sweeps
block_m (and block_n for K3) on the two decision shapes.

Run: python tools/exp_pallas_tune.py [--shape 80:128] [--k3]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from _bench_util import timed  # noqa: E402

from yolov10_3d_tpu.ops.pallas_kernels import (  # noqa: E402
    int8_conv3x3_fused, int8_mm_fused,
)

L = 8
B = 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="80:128")
    ap.add_argument("--k3", action="store_true")
    args = ap.parse_args()
    hw, C = (int(v) for v in args.shape.split(":"))
    rng = np.random.default_rng(0)
    inv = jnp.float32(4.0)
    scales = [jnp.asarray(rng.uniform(1e-4, 2e-4, C).astype(np.float32)) for _ in range(L)]
    biases = [jnp.asarray(rng.uniform(-0.1, 0.1, C).astype(np.float32)) for _ in range(L)]

    if args.k3:
        flops = 2.0 * B * hw * hw * C * C * 9
        bytes_ = 2 * B * hw * hw * C + 9 * C * C
        xq = jnp.asarray(rng.integers(-127, 128, (B, hw, hw, C)).astype(np.int8))
        wqs = [jnp.asarray(rng.integers(-127, 128, (3, 3, C, C)).astype(np.int8)) for _ in range(L)]
        for bn in (64, 128, 256):
            if C % bn:
                continue

            def chain(xq, wqs, scales, biases, inv, bn=bn):
                for i in range(L):
                    xq = int8_conv3x3_fused(xq, wqs[i], scales[i], biases[i], inv, block_n=bn)
                return xq[0, 0, 0, 0].astype(jnp.float32), xq

            ms = timed(jax.jit(chain), xq, wqs, scales, biases, inv, iters=4) / L * 1e3
            print(f"  k3 block_n={bn:<5} {ms:8.3f} ms/layer "
                  f"{flops / ms / 1e9:7.1f} TF/s {bytes_ / ms / 1e6:7.0f} GB/s", flush=True)
    else:
        M, K, N = B * hw * hw, C, C
        flops = 2.0 * M * K * N
        bytes_ = M * K + K * N + M * N
        xq = jnp.asarray(rng.integers(-127, 128, (M, K)).astype(np.int8))
        wqs = [jnp.asarray(rng.integers(-127, 128, (K, N)).astype(np.int8)) for _ in range(L)]
        for bm in (1024, 2048, 4096, 8192):

            def chain(xq, wqs, scales, biases, inv, bm=bm):
                for i in range(L):
                    xq = int8_mm_fused(xq, wqs[i], scales[i], biases[i], inv,
                                       block_m=bm, block_n=N)
                return xq[0, 0].astype(jnp.float32), xq

            ms = timed(jax.jit(chain), xq, wqs, scales, biases, inv, iters=4) / L * 1e3
            print(f"  mm block_m={bm:<5} {ms:8.3f} ms/layer "
                  f"{flops / ms / 1e9:7.1f} TF/s {bytes_ / ms / 1e6:7.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
