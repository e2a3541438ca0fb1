"""IDR-style rendering network (alternative color head).

Re-design of /root/reference/models/modules/rendering_network.py:90-151 —
the IDR surface-light-field MLP: RGB from (point, normal, view direction,
geometry feature vector), with optional view-direction positional encoding,
weight-normalized Dense layers, a sqrt(2)-scaled input skip, and sigmoid
squeeze. The reference constructs it nowhere (`ImplicitSurface` uses
`BlendingNetwork`, implicit_surface.py:57); it is provided here as a working
selectable option (``config.color_network.head = "idr"``) for per-scene
regimes where no source-view features exist to blend.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from gens_tpu.models.embedder import positional_encoding, positional_encoding_dim
from gens_tpu.models.sdf_net import WNLinear


class RenderingNetwork(nn.Module):
    """Modes (rendering_network.py:109-117): 'idr' consumes
    [points, view_dirs, normals, features]; 'no_view_dir' drops view_dirs;
    'no_normal' drops normals."""

    d_feature: int = 128
    mode: str = "idr"
    d_out: int = 3
    d_hidden: int = 256
    n_layers: int = 4
    skip_in: Tuple[int, ...] = ()
    weight_norm: bool = True
    multires_view: int = 0
    squeeze_out: bool = True

    @nn.compact
    def __call__(self, points, normals, view_dirs, feature_vectors):
        if self.multires_view > 0:
            view_dirs = positional_encoding(view_dirs, self.multires_view)
        if self.mode == "idr":
            x = jnp.concatenate(
                [points, view_dirs, normals, feature_vectors], axis=-1)
        elif self.mode == "no_view_dir":
            x = jnp.concatenate([points, normals, feature_vectors], axis=-1)
        elif self.mode == "no_normal":
            x = jnp.concatenate([points, view_dirs, feature_vectors], axis=-1)
        else:
            raise ValueError(f"unknown rendering mode {self.mode!r}")

        inp = x
        d_in = x.shape[-1]
        dims = [d_in] + [self.d_hidden] * self.n_layers + [self.d_out]
        Dense = WNLinear if self.weight_norm else nn.Dense
        for layer in range(len(dims) - 1):
            out_dim = dims[layer + 1]
            if layer + 1 in self.skip_in:
                out_dim = out_dim - d_in
            if layer in self.skip_in:
                x = jnp.concatenate([x, inp], axis=-1) / jnp.sqrt(2.0)
            x = Dense(out_dim, name=f"lin{layer}")(x)
            if layer < len(dims) - 2:
                x = nn.relu(x)
        if self.squeeze_out:
            x = nn.sigmoid(x)
        return x


def rendering_input_dim(mode: str, d_feature: int, multires_view: int) -> int:
    d_view = positional_encoding_dim(multires_view, 3)
    if mode == "idr":
        return 3 + d_view + 3 + d_feature
    if mode == "no_view_dir":
        return 3 + 3 + d_feature
    if mode == "no_normal":
        return 3 + d_view + d_feature
    raise ValueError(mode)
