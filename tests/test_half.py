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
