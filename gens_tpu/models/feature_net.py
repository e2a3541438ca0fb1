"""Multi-scale FPN feature extractor (2D), channels-last.

Self-contained re-design of the reference's feature networks: the active
MnasNet-FPN (/root/reference/models/modules/feature_network_mnasnet.py:52-103)
depends on ImageNet-pretrained torchvision weights; SURVEY.md §7.1.6 selects
the self-contained generic-FPN option. Encoder: 5 stages at strides
2..32 with InstanceNorm+ReLU; decoder: transposed-conv top-down path with
additive skips; 5 heads emit ``d_out[i]`` channels at strides
1, 2, 4, 8, 16 (fine-to-coarse), matching the reference's output pyramid
(feature_network_mnasnet.py:89-101).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from gens_tpu.config import FeatureNetConfig


class InstanceNorm(nn.Module):
    """InstanceNorm without affine params (torch ``InstanceNorm2d/3d``
    defaults — reference feature_network_mnasnet.py:17, reg_network.py:16).

    Works for any rank: normalizes over all axes except batch (axis 0) and
    channel (axis -1).
    """

    @nn.compact
    def __call__(self, x):
        spatial = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=spatial, keepdims=True)
        var = jnp.var(x, axis=spatial, keepdims=True)
        return (x - mean) / jnp.sqrt(var + 1e-5)


class ConvBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    use_bias=False)(x)
        x = InstanceNorm()(x)
        return nn.relu(x)


class DeconvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.features, (3, 3), strides=(2, 2),
                             use_bias=False)(x)
        x = InstanceNorm()(x)
        return nn.relu(x)


class FeatureNetwork(nn.Module):
    cfg: FeatureNetConfig

    @nn.compact
    def __call__(self, imgs: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """imgs (V, H, W, 3) -> 5 feature maps (V, H_i, W_i, d_out[i]),
        fine-to-coarse (strides 1, 2, 4, 8, 16). H, W must be multiples of 32.
        """
        d_enc = self.cfg.d_enc  # channels of encoder stages at strides 2..32
        d_out = self.cfg.d_out
        d_dec = (8,) + tuple(d_enc[:-1])  # decoder channels at strides 1..16

        x = imgs
        encs = []
        for ch in d_enc:
            x = ConvBlock(ch, stride=2)(x)
            x = ConvBlock(ch, stride=1)(x)
            encs.append(x)

        # top-down: dec at stride 2^i gets a skip from enc at the same stride
        decs = []  # strides 16, 8, 4, 2, 1 (coarse-to-fine while building)
        d = encs[-1]
        for i in range(len(d_enc) - 2, -1, -1):
            d = DeconvBlock(d_dec[i + 1])(d) + encs[i]
            decs.append(d)
        d = DeconvBlock(d_dec[0])(d)  # full resolution, no skip
        decs.append(d)

        decs = decs[::-1]  # fine-to-coarse: strides 1, 2, 4, 8, 16
        outs = tuple(
            nn.Conv(d_out[i], (3, 3), use_bias=False)(decs[i])
            for i in range(len(d_out))
        )
        return outs
