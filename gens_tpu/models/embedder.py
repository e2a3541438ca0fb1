"""NeRF positional encoding (reference models/modules/embedder.py:6-51)."""

from __future__ import annotations

import jax.numpy as jnp


def positional_encoding_dim(multires: int, input_dims: int) -> int:
    if multires <= 0:
        return input_dims
    return input_dims * (1 + 2 * multires)


def positional_encoding(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """[x, sin(2^0 x), cos(2^0 x), ..., sin(2^(m-1) x), cos(2^(m-1) x)].

    Matches the reference ordering (embedder.py:27-30: per-frequency
    sin then cos, input included first). Identity when ``multires <= 0``.
    """
    if multires <= 0:
        return x
    outs = [x]
    for i in range(multires):
        freq = 2.0 ** i
        outs.append(jnp.sin(x * freq))
        outs.append(jnp.cos(x * freq))
    return jnp.concatenate(outs, axis=-1)
