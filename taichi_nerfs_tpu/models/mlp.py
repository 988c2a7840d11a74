"""Functional skip-connection MLP (pytree params, no framework).

Rebuild of the reference's nerfacc-derived ``MLP`` module
(``modules/networks.py:293-380``): configurable depth/width, skip concat
every ``skip_layer`` layers (after layer 0), xavier-uniform init, ReLU hidden
activation, optional output layer/activation, optional bias.  Matmuls run in
a configurable compute dtype (bf16 rides the MXU) with fp32 accumulation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MLPSpec:
    input_dim: int
    output_dim: Optional[int] = None
    net_depth: int = 8
    net_width: int = 256
    skip_layer: Optional[int] = 4
    output_enabled: bool = True
    bias_enabled: bool = True
    hidden_activation: str = "relu"
    output_activation: str = "none"  # {"none", "sigmoid"}

    def layer_dims(self):
        """(in, out) per layer, mirroring networks.py:328-343."""
        dims = []
        in_features = self.input_dim
        for i in range(self.net_depth):
            dims.append((in_features, self.net_width))
            if (
                self.skip_layer is not None
                and i % self.skip_layer == 0
                and i > 0
            ):
                in_features = self.net_width + self.input_dim
            else:
                in_features = self.net_width
        if self.output_enabled:
            dims.append((in_features, self.output_dim))
        return dims


def _xavier_uniform(key: jax.Array, fan_in: int, fan_out: int) -> jnp.ndarray:
    a = jnp.sqrt(6.0 / (fan_in + fan_out))
    # stored (in, out): apply is x @ w, matching torch's x @ W.T
    return jax.random.uniform(
        key, (fan_in, fan_out), jnp.float32, minval=-a, maxval=a
    )


def init_mlp(key: jax.Array, spec: MLPSpec) -> Dict[str, Any]:
    dims = spec.layer_dims()
    keys = jax.random.split(key, len(dims))
    params: Dict[str, Any] = {}
    for i, ((fi, fo), k) in enumerate(zip(dims, keys)):
        params[f"w{i}"] = _xavier_uniform(k, fi, fo)
        if spec.bias_enabled:
            params[f"b{i}"] = jnp.zeros((fo,), jnp.float32)
    return params


def _act(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name == "relu":
        return jax.nn.relu
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "none":
        return lambda x: x
    raise ValueError(name)


def apply_mlp(
    params: Dict[str, Any],
    spec: MLPSpec,
    x: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Forward pass (reference: networks.py:369-380).

    All matmuls accumulate in fp32 (``preferred_element_type``); activations
    between layers stay in ``compute_dtype``.
    """
    hidden = _act(spec.hidden_activation)

    def linear(i: int, h: jnp.ndarray) -> jnp.ndarray:
        w = params[f"w{i}"].astype(compute_dtype)
        y = jnp.dot(
            h.astype(compute_dtype), w, preferred_element_type=jnp.float32
        )
        if spec.bias_enabled:
            y = y + params[f"b{i}"]
        return y

    inputs = x
    h = x
    for i in range(spec.net_depth):
        h = hidden(linear(i, h))
        if (
            spec.skip_layer is not None
            and i % spec.skip_layer == 0
            and i > 0
        ):
            h = jnp.concatenate([h, inputs], axis=-1)
    if spec.output_enabled:
        h = _act(spec.output_activation)(linear(spec.net_depth, h))
    return h
