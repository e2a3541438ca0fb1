"""MnasNet-1.0 FPN feature extractor (flax) + torchvision weight converter.

The reference's production feature network slices torchvision's
ImageNet-pretrained ``mnasnet1_0`` into 5 encoder stages and decodes them
with a deconv FPN (/root/reference/models/modules/feature_network_mnasnet.py
:52-103). This module re-creates that architecture in flax so the
pretrained weights can be ported once, offline, with
``scripts/convert_mnasnet_weights.py`` — no torch dependency at runtime.
(The self-contained generic FPN in ``feature_net.py`` remains the default;
SURVEY.md §7.1.6.)

Stage boundaries match the reference slicing of ``mnasnet.layers``:
  layers[0:8]   stem: conv3x3 s2 + dw3x3 + pw -> 16ch @ 1/2    (enc1)
  layers[8]     stack 16->24, k3 s2 e3 n3     -> 24ch @ 1/4    (enc2)
  layers[9]     stack 24->40, k5 s2 e3 n3     -> 40ch @ 1/8    (enc3)
  layers[10:12] stacks 40->80 k5 s2 e6 n3; 80->96 k3 s1 e6 n2
                                              -> 96ch @ 1/16   (enc4)
  layers[12:14] stacks 96->192 k5 s2 e6 n4; 192->320 k3 s1 e6 n1
                                              -> 320ch @ 1/32  (enc5)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from gens_tpu.config import FeatureNetConfig
from gens_tpu.models.feature_net import DeconvBlock, InstanceNorm

_BN_EPS = 1e-5


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        # explicit torch-style padding (k//2 both sides): flax 'SAME' pads
        # asymmetrically for stride-2 on even inputs ((0,1) for k=3 instead
        # of torch's (1,1)), which would silently shift every strided stage
        # half a pixel off the pretrained weights
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    feature_group_count=self.groups, use_bias=False,
                    name="conv")(x)
        # inference-mode BatchNorm: y = (x - mean) / sqrt(var) * scale + bias
        x = nn.BatchNorm(use_running_average=True, epsilon=_BN_EPS,
                         name="bn")(x)
        return nn.relu(x) if self.relu else x


class InvertedResidual(nn.Module):
    features: int
    kernel: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        y = ConvBN(mid, kernel=1, name="expand")(x)
        y = ConvBN(mid, kernel=self.kernel, stride=self.stride, groups=mid,
                   name="depthwise")(y)
        y = ConvBN(self.features, kernel=1, relu=False, name="project")(y)
        if self.stride == 1 and in_ch == self.features:
            y = y + x
        return y


class Stack(nn.Module):
    features: int
    kernel: int
    stride: int
    expand: int
    repeats: int

    @nn.compact
    def __call__(self, x):
        x = InvertedResidual(self.features, self.kernel, self.stride,
                             self.expand, name="block0")(x)
        for i in range(1, self.repeats):
            x = InvertedResidual(self.features, self.kernel, 1, self.expand,
                                 name=f"block{i}")(x)
        return x


class MnasNetEncoder(nn.Module):
    """MnasNet-B1 (depth multiplier 1.0) trunk, emitting the 5 FPN stages."""

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        # stem (torchvision layers 0-7)
        x = ConvBN(32, kernel=3, stride=2, name="stem_conv")(x)
        x = ConvBN(32, kernel=3, groups=32, name="stem_dw")(x)
        enc1 = ConvBN(16, kernel=1, relu=False, name="stem_pw")(x)  # 1/2

        enc2 = Stack(24, 3, 2, 3, 3, name="stack1")(enc1)           # 1/4
        enc3 = Stack(40, 5, 2, 3, 3, name="stack2")(enc2)           # 1/8
        x = Stack(80, 5, 2, 6, 3, name="stack3")(enc3)
        enc4 = Stack(96, 3, 1, 6, 2, name="stack4")(x)               # 1/16
        x = Stack(192, 5, 2, 6, 4, name="stack5")(enc4)
        enc5 = Stack(320, 3, 1, 6, 1, name="stack6")(x)              # 1/32
        return enc1, enc2, enc3, enc4, enc5


class MnasNetFeatureNetwork(nn.Module):
    """MnasNet encoder + deconv FPN decoder with the reference's channel
    plan (feature_network_mnasnet.py:65-75)."""

    cfg: FeatureNetConfig

    @nn.compact
    def __call__(self, imgs: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        d_out = self.cfg.d_out
        enc1, enc2, enc3, enc4, enc5 = MnasNetEncoder(name="encoder")(imgs)

        dec5 = DeconvBlock(96, name="decod_layer5")(enc5) + enc4   # 1/16
        dec4 = DeconvBlock(40, name="decod_layer4")(dec5) + enc3   # 1/8
        dec3 = DeconvBlock(24, name="decod_layer3")(dec4) + enc2   # 1/4
        dec2 = DeconvBlock(16, name="decod_layer2")(dec3) + enc1   # 1/2
        dec1 = DeconvBlock(8, name="decod_layer1")(dec2)           # 1/1

        decs = (dec1, dec2, dec3, dec4, dec5)
        return tuple(
            nn.Conv(d_out[i], (3, 3), use_bias=False,
                    name=f"out_layer{i + 1}")(decs[i])
            for i in range(5)
        )


# ---------------------------------------------------------------------------
# torchvision state_dict -> flax params conversion (offline; see
# scripts/convert_mnasnet_weights.py)

_STACK_TORCH_IDX = {  # flax stack name -> torchvision layers index
    "stack1": 8, "stack2": 9, "stack3": 10, "stack4": 11,
    "stack5": 12, "stack6": 13,
}


def convert_torch_mnasnet(state_dict) -> dict:
    """Map torchvision ``mnasnet1_0().state_dict()`` tensors onto the
    ``MnasNetEncoder`` param/batch_stats pytree.

    torch conv weights are (O, I, kh, kw) -> flax (kh, kw, I, O); depthwise
    (C, 1, kh, kw) -> flax (kh, kw, 1, C).
    """
    import numpy as np

    def conv_w(name, depthwise=False):
        w = np.asarray(state_dict[name])
        if depthwise:
            return np.transpose(w, (2, 3, 1, 0))
        return np.transpose(w, (2, 3, 1, 0))

    def bn(prefix):
        return (
            {"scale": np.asarray(state_dict[prefix + ".weight"]),
             "bias": np.asarray(state_dict[prefix + ".bias"])},
            {"mean": np.asarray(state_dict[prefix + ".running_mean"]),
             "var": np.asarray(state_dict[prefix + ".running_var"])},
        )

    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def convbn(flax_path, conv_name, bn_name, depthwise=False):
        put(params, flax_path + ("conv", "kernel"),
            conv_w(conv_name, depthwise))
        p, s = bn(bn_name)
        put(params, flax_path + ("bn",), p)
        put(stats, flax_path + ("bn",), s)

    convbn(("stem_conv",), "layers.0.weight", "layers.1")
    convbn(("stem_dw",), "layers.3.weight", "layers.4", depthwise=True)
    convbn(("stem_pw",), "layers.6.weight", "layers.7")

    specs = {"stack1": 3, "stack2": 3, "stack3": 3, "stack4": 2,
             "stack5": 4, "stack6": 1}
    for stack, n_blocks in specs.items():
        t = _STACK_TORCH_IDX[stack]
        for b in range(n_blocks):
            base = f"layers.{t}.{b}.layers"
            fp = (stack, f"block{b}")
            convbn(fp + ("expand",), f"{base}.0.weight", f"{base}.1")
            convbn(fp + ("depthwise",), f"{base}.3.weight", f"{base}.4",
                   depthwise=True)
            convbn(fp + ("project",), f"{base}.6.weight", f"{base}.7")

    return {"params": params, "batch_stats": stats}
