"""3D U-Net volume regularizer, channels-last.

Re-design of /root/reference/models/modules/reg_network.py:104-166: the raw
mean/var volume cascade (fine-to-coarse) is consumed coarse-injection style —
each encoder depth concatenates the next-coarser raw volume — and a
transposed-conv decoder with additive skips emits one refined feature volume
per scale (``d_out[i]`` channels) at the cascade's resolutions.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from gens_tpu.config import RegNetConfig
from gens_tpu.models.feature_net import InstanceNorm


class Conv3dBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3, 3),
                    strides=(self.stride,) * 3, use_bias=False)(x)
        x = InstanceNorm()(x)
        return nn.relu(x)


class Deconv3dBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.features, (3, 3, 3), strides=(2, 2, 2),
                             use_bias=False)(x)
        x = InstanceNorm()(x)
        return nn.relu(x)


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

        e_outs = []
        e = Conv3dBlock(c.d_base)(volumes[0])  # conv0, reg_network.py:118
        e_outs.append(e)
        for i in range(n):
            dim_m = c.d_base * 2 ** i
            e = Conv3dBlock(dim_m, stride=2)(e)
            e = Conv3dBlock(dim_m)(e)
            e_outs.append(e)
            if i < n - 1:
                e = jnp.concatenate([e, volumes[i + 1]], axis=-1)

        d_outs = [e_outs[-1]]
        for i in range(n - 1, -1, -1):
            d = Deconv3dBlock(c.d_base * 2 ** max(i - 1, 0))(d_outs[-1]) + e_outs[i]
            d_outs.append(d)
        d_outs = d_outs[::-1]

        outs = tuple(
            nn.Conv(c.d_out[i], (3, 3, 3))(d_outs[i]) for i in range(n)
        )
        return outs
