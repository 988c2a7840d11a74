"""bf16-table (half2 analogue) encoder variants stay close to fp32."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from taichi_nerfs_tpu.config import BrickGridConfig, HashGridConfig
from taichi_nerfs_tpu.ops.brick_encoder import (
    brick_encode,
    build_brick_layout,
    init_brick_params,
)
from taichi_nerfs_tpu.ops.hash_encoder import (
    build_layout,
    hash_encode,
    init_hash_table,
)


def test_hash_bf16_close_to_fp32():
    cfg = HashGridConfig(
        levels=4, feature_per_level=2, log2_T=11, base_res=4, max_res=32
    )
    layout = build_layout(cfg)
    table = init_hash_table(jax.random.PRNGKey(0), layout)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    full = np.asarray(hash_encode(table, xyz, layout))
    half = np.asarray(
        hash_encode(table.astype(jnp.bfloat16), xyz, layout)
    )
    np.testing.assert_allclose(half, full, rtol=2e-2, atol=2e-2)


def test_brick_bf16_close_to_fp32_and_grads_fp32():
    cfg = BrickGridConfig(
        levels=4, feature_per_level=2, log2_rows=9, base_res=4, max_res=32
    )
    layout32 = build_brick_layout(cfg)
    layout16 = build_brick_layout(
        dataclasses.replace(cfg, table_dtype="bfloat16")
    )
    params = init_brick_params(jax.random.PRNGKey(0), layout32)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    full = np.asarray(brick_encode(params, xyz, layout32))
    half = np.asarray(brick_encode(params, xyz, layout16))
    np.testing.assert_allclose(half, full, rtol=2e-2, atol=2e-2)

    g = jax.grad(lambda p: jnp.sum(brick_encode(p, xyz, layout16) ** 2))(
        params
    )
    # master grads stay fp32 and are finite/nonzero
    assert g["corners"].dtype == jnp.float32
    assert g["bricks"].dtype == jnp.float32
    assert float(jnp.abs(g["corners"]).max()) > 0


def test_hash_packed_pair_matches_per_channel():
    """Packed u32-pair gather (one row per slot) is bit-identical to the
    per-channel bf16 gathers in the forward and close in the backward."""
    from taichi_nerfs_tpu.ops import hash_encoder as he

    cfg = HashGridConfig(
        levels=4, feature_per_level=2, log2_T=11, base_res=4, max_res=32
    )
    layout = build_layout(cfg)
    table = init_hash_table(jax.random.PRNGKey(0), layout)
    t16 = table.astype(jnp.bfloat16)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))

    packed = np.asarray(hash_encode(t16, xyz, layout))

    # reference side: force the per-channel loop by monkeypatching the
    # packed gather to the unpacked channels (widened to f32, the same
    # values the packed path unpacks by bitcast)
    orig = he._gather_pair_bf16
    try:
        he._gather_pair_bf16 = lambda t, idx: (
            jnp.take(t[0], idx, axis=0).astype(jnp.float32),
            jnp.take(t[1], idx, axis=0).astype(jnp.float32),
        )
        per_channel = np.asarray(hash_encode(t16, xyz, layout))
    finally:
        he._gather_pair_bf16 = orig
    np.testing.assert_array_equal(packed, per_channel)

    # backward: packed custom-VJP grads close to autodiff-of-per-channel
    def loss_packed(t):
        return jnp.sum(hash_encode(t.astype(jnp.bfloat16), xyz, layout) ** 2)

    g_packed = jax.grad(loss_packed)(table)

    def loss_plain(t):
        t16_ = t.astype(jnp.bfloat16)
        # inline per-channel encode via the public API with the pack
        # disabled (F=2 gate off through a float32 table of bf16 values)
        return jnp.sum(
            hash_encode(t16_.astype(jnp.float32), xyz, layout) ** 2
        )

    g_plain = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(
        np.asarray(g_packed), np.asarray(g_plain), rtol=2e-2, atol=2e-2
    )
    assert g_packed.dtype == jnp.float32
