#!/usr/bin/env python
"""Probe: compile just the Pallas stem kernel and print the FULL Mosaic error."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.devices()

import exp_pallas_stem2 as E

B, H, W, CIN = E.B, E.H, E.W, E.CIN

rng = np.random.default_rng(0)
# tiny host array broadcast on device to avoid the 314MB tunnel transfer
x = jnp.broadcast_to(
    jnp.asarray(rng.uniform(-1, 1, (1, H, W, CIN)), jnp.bfloat16), (B, H, W, CIN)
).copy() if False else jnp.zeros((B, H, W, CIN), jnp.bfloat16)
w = jnp.asarray(rng.normal(0, 0.1, (3, 3, CIN, E.COUT)), jnp.float32)
b = jnp.asarray(rng.normal(0, 0.1, (E.COUT,)), jnp.float32)

variant = sys.argv[1] if len(sys.argv) > 1 else "A"
f = E.make_pallas_stem(variant)
try:
    out = f(x, w, b)
    jax.block_until_ready(out)
    print("variant", variant, "compiled and ran ok:", out.shape, out.dtype)
except Exception as e:
    print("FULL ERROR:\n", str(e))
