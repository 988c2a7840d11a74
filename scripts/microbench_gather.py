"""Micro-bench: hash-table gather strategies for the packed field eval.

The flagship hash encoder issues, per packed sample, (levels x 8) = 128
row-gathers per feature channel (ops/hash_encoder.py).  Candidates:

* f32x2:   two separate (M, 128) gathers from (n_entries,) f32 channels
           (current ops/hash_encoder.py layout).
* bf16pk:  ONE (M, 128) gather from an (n_entries,) f32 view holding both
           bf16 feature channels packed per entry (the TPU analogue of the
           reference's half2 trick, hash_encoder_half.py) + bitcast split.
* brick:   one (M, levels) row-gather of (8F)-wide brick rows
           (ops/brick_encoder.py layout) for comparison.

Run on the real chip:
    PYTHONPATH=/root/repo timeout 580 python scripts/microbench_gather.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

M = 196608  # packed samples (batch 8192 x ~24 samples/ray)
C = 128  # levels * corners
L = 16
N_ENTRIES = 16 * (2**19)


def timed(fn, *args, n=20, warmup=4):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


@jax.jit
def gather_f32x2(t0, t1, idx):
    return jnp.take(t0, idx, axis=0), jnp.take(t1, idx, axis=0)


@jax.jit
def gather_bf16_packed(packed, idx):
    g = jnp.take(packed, idx, axis=0)  # (M, C) f32-encoded bf16 pair
    u = g.view(jnp.uint32) if hasattr(g, "view") else g
    u = jax.lax.bitcast_convert_type(g, jnp.uint32)
    f0 = jax.lax.bitcast_convert_type(
        (u & jnp.uint32(0xFFFF0000)), jnp.float32
    )  # high half == feature 0 as bf16 -> f32 by zero-padding mantissa
    f1 = jax.lax.bitcast_convert_type(
        (u << jnp.uint32(16)), jnp.float32
    )
    return f0, f1


@jax.jit
def gather_brick(table, idx_l):
    return jnp.take(table, idx_l, axis=0)  # (M*L, 8F)


def main():
    rng = np.random.RandomState(0)
    t0 = jnp.asarray(rng.uniform(size=(N_ENTRIES,)), jnp.float32)
    t1 = jnp.asarray(rng.uniform(size=(N_ENTRIES,)), jnp.float32)
    # pack: high 16 bits = bf16(t0), low 16 = bf16(t1)
    b0 = np.asarray(t0, np.float32).view(np.uint32) & 0xFFFF0000
    b1 = (np.asarray(t1, np.float32).view(np.uint32) & 0xFFFF0000) >> 16
    packed = jnp.asarray((b0 | b1).view(np.float32))
    idx = jnp.asarray(
        rng.randint(0, N_ENTRIES, size=(M, C)), jnp.int32
    )
    brick_table = jnp.asarray(
        rng.uniform(size=(2**17 + 600000, 32)), jnp.float32
    )
    idx_l = jnp.asarray(
        rng.randint(0, brick_table.shape[0], size=(M * L,)), jnp.int32
    )

    a0, a1 = jax.tree.map(np.asarray, gather_f32x2(t0, t1, idx))
    p0, p1 = jax.tree.map(np.asarray, gather_bf16_packed(packed, idx))
    err0 = np.max(np.abs(a0 - p0))
    err1 = np.max(np.abs(a1 - p1))
    print(f"bf16 pack max err: {err0:.5f} / {err1:.5f} (bf16 quantization)")

    ms = timed(gather_f32x2, t0, t1, idx)
    print(f"f32 two-gather:   {ms:7.3f} ms  ({2*M*C/ms*1e3/1e6:.0f} M rows/s)")
    ms = timed(gather_bf16_packed, packed, idx)
    print(f"bf16 one-gather:  {ms:7.3f} ms  ({M*C/ms*1e3/1e6:.0f} M rows/s)")
    ms = timed(gather_brick, brick_table, idx_l)
    print(f"brick row-gather: {ms:7.3f} ms  ({M*L/ms*1e3/1e6:.0f} M rows/s)")


if __name__ == "__main__":
    main()
