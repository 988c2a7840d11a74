"""Micro-bench: (N, K) -> (N, S) per-ray sample compaction strategies.

The marcher must compact the first S occupied candidates per ray out of a
K-wide probe window (march_rays, ops/marching.py).  Candidates:

* topk:    the current lax.top_k over a keyed window (sorts the full K).
* scatter: cumsum slot assignment + one 2D scatter (drop out-of-range).
* gather:  cumsum + per-slot searchsorted (vmapped binary search gathers).

Also times the raw occupancy probe and the packed field-eval gather for
context.  Run on the real chip:
    PYTHONPATH=/root/repo timeout 580 python scripts/microbench_compact.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

N, K, S = 8192, 1032, 128


def timed(fn, *args, n=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


@jax.jit
def compact_topk(occ, ts, dts):
    k_idx = jnp.arange(K, dtype=jnp.int32)[None, :]
    key = jnp.where(occ, K - k_idx, 0)
    top_keys, _ = jax.lax.top_k(key, S)
    valid = top_keys > 0
    sel = jnp.where(valid, K - top_keys, 0)
    out_ts = jnp.where(valid, jnp.take_along_axis(ts, sel, axis=1), 0.0)
    out_dt = jnp.where(valid, jnp.take_along_axis(dts, sel, axis=1), 0.0)
    counts = jnp.minimum(jnp.sum(occ, axis=1), S).astype(jnp.int32)
    return out_ts, out_dt, counts


@jax.jit
def compact_scatter(occ, ts, dts):
    c = jnp.cumsum(occ.astype(jnp.int32), axis=1)  # inclusive
    slot = jnp.where(occ, c - 1, S)  # S (or >=S) drops
    rows = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, K))
    payload = jnp.stack([ts, dts], axis=-1)  # (N, K, 2)
    dense = (
        jnp.zeros((N, S, 2), ts.dtype)
        .at[rows, slot]
        .set(payload, mode="drop", unique_indices=True)
    )
    counts = jnp.minimum(c[:, -1], S).astype(jnp.int32)
    return dense[..., 0], dense[..., 1], counts


@jax.jit
def compact_gather(occ, ts, dts):
    c = jnp.cumsum(occ.astype(jnp.int32), axis=1)
    targets = jnp.arange(1, S + 1, dtype=jnp.int32)

    def per_ray(c_row):
        return jnp.searchsorted(c_row, targets, side="left")

    sel = jax.vmap(per_ray)(c)  # (N, S) first k with cumsum == s+1
    counts = jnp.minimum(c[:, -1], S).astype(jnp.int32)
    valid = targets[None, :] <= counts[:, None]
    sel = jnp.minimum(sel, K - 1)
    out_ts = jnp.where(valid, jnp.take_along_axis(ts, sel, axis=1), 0.0)
    out_dt = jnp.where(valid, jnp.take_along_axis(dts, sel, axis=1), 0.0)
    return out_ts, out_dt, counts


def main():
    rng = np.random.RandomState(0)
    # ~15% occupancy in a band, like a settled grid
    occ = jnp.asarray(rng.uniform(size=(N, K)) < 0.15)
    ts = jnp.asarray(rng.uniform(0.01, 1.7, size=(N, K)), jnp.float32)
    dts = jnp.asarray(rng.uniform(1e-3, 1e-2, size=(N, K)), jnp.float32)

    o1 = jax.tree.map(np.asarray, compact_topk(occ, ts, dts))
    o2 = jax.tree.map(np.asarray, compact_scatter(occ, ts, dts))
    o3 = jax.tree.map(np.asarray, compact_gather(occ, ts, dts))
    for name, o in (("scatter", o2), ("gather", o3)):
        for a, b, part in zip(o1, o, ("ts", "dts", "counts")):
            assert np.allclose(a, b), f"{name} mismatch on {part}"
    print("parity ok (scatter+gather == topk)")

    print(f"topk:    {timed(compact_topk, occ, ts, dts):7.3f} ms")
    print(f"scatter: {timed(compact_scatter, occ, ts, dts):7.3f} ms")
    print(f"gather:  {timed(compact_gather, occ, ts, dts):7.3f} ms")


if __name__ == "__main__":
    main()
