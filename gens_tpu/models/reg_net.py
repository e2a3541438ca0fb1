"""3D U-Net volume regularizer.

Re-design of /root/reference/models/modules/reg_network.py:104-166: the raw
mean/var volume cascade (fine-to-coarse) is consumed coarse-injection style —
each encoder depth concatenates the next-coarser raw volume — and a decoder
with additive skips emits one refined feature volume per scale
(``d_out[i]`` channels) at the cascade's resolutions.

TPU mapping note (measured on v5e): XLA's native 3D convolution lowers a
256³ x 8ch volume into an internal buffer whose tile padding explodes 16x
(528 MB -> 8.25 GB), OOMing compilation — in any layout. Here every 3x3x3
conv is expressed as a 2D (3, 3) conv over (Y, Z) with the X-neighborhood
stacked into input channels and X as the batch dim; that hits XLA's
well-tuned 2D conv path (4 s compile, sub-ms run at 256³). Up-sampling uses
nearest-resize + conv (instead of the reference's ConvTranspose3d,
reg_network.py:30-50) — same receptive structure, no checkerboard pattern,
and the same 2D lowering applies.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gens_tpu.config import RegNetConfig


def _x_stack(x: jnp.ndarray) -> jnp.ndarray:
    """(X, Y, Z, C) -> (X, Y, Z, 3C): channels hold the x+1 / x / x-1
    neighborhood (zero padded at the ends)."""
    zeros = jnp.zeros_like(x[:1])
    up = jnp.concatenate([x[1:], zeros], axis=0)
    down = jnp.concatenate([zeros, x[:-1]], axis=0)
    return jnp.concatenate([up, x, down], axis=-1)


class Conv3dBlock(nn.Module):
    """3x3x3 conv via x-stacked 2D conv (+ optional InstanceNorm+ReLU).

    Operates UNBATCHED: x (X, Y, Z, C)."""

    features: int
    stride: int = 1
    norm_relu: bool = True

    @nn.compact
    def __call__(self, x):
        xm = _x_stack(x)
        in_ch = xm.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, in_ch, self.features))
        y = jax.lax.conv_general_dilated(
            xm, w, (self.stride, self.stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.stride == 2:
            y = y[::2]
        if not self.norm_relu:
            b = self.param("bias", nn.initializers.zeros_init(),
                           (self.features,))
            return y + b
        mean = jnp.mean(y, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(y, axis=(0, 1, 2), keepdims=True)
        y = (y - mean) / jnp.sqrt(var + 1e-5)
        return nn.relu(y)


class Upsample3dBlock(nn.Module):
    """x2 nearest-neighbour upsample + 3x3x3 conv + InstanceNorm + ReLU."""

    features: int

    @nn.compact
    def __call__(self, x):
        X, Y, Z, C = x.shape
        x = jnp.repeat(jnp.repeat(jnp.repeat(x, 2, 0), 2, 1), 2, 2)
        return Conv3dBlock(self.features)(x)


class RegNetwork(nn.Module):
    cfg: RegNetConfig

    @nn.compact
    def __call__(self, volumes: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        """volumes: cascade of (1, X_i, Y_i, Z_i, 2C) raw mean/var volumes,
        fine-to-coarse with X_{i+1} = X_i / 2. Returns refined volumes
        (1, X_i, Y_i, Z_i, d_out[i]), fine-to-coarse.
        """
        c = self.cfg
        n = len(c.d_out)
        assert len(volumes) == n
        vols = [v[0] for v in volumes]  # drop the singleton batch dim

        e_outs = []
        e = Conv3dBlock(c.d_base)(vols[0])  # conv0, reg_network.py:118
        e_outs.append(e)
        for i in range(n):
            dim_m = c.d_base * 2 ** i
            e = Conv3dBlock(dim_m, stride=2)(e)
            e = Conv3dBlock(dim_m)(e)
            e_outs.append(e)
            if i < n - 1:
                e = jnp.concatenate([e, vols[i + 1]], axis=-1)

        d_outs = [e_outs[-1]]
        for i in range(n - 1, -1, -1):
            d = Upsample3dBlock(c.d_base * 2 ** max(i - 1, 0))(d_outs[-1]) \
                + e_outs[i]
            d_outs.append(d)
        d_outs = d_outs[::-1]

        outs = tuple(
            Conv3dBlock(c.d_out[i], norm_relu=False)(d_outs[i])[None]
            for i in range(n)
        )
        return outs
