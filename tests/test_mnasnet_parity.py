"""Numerical parity of the MnasNet encoder port against a torch oracle
(VERDICT r1 item #5).

The reference's quality depends on the ImageNet-pretrained MnasNet-1.0
backbone (/root/reference/models/modules/feature_network_mnasnet.py:57-75);
the converter used to port those weights must reproduce torchvision's
forward EXACTLY or the pretrained features are garbage. torchvision is not
in this image, so the oracle is a line-for-line torch replica of
torchvision.models.MNASNet(alpha=1.0)'s module tree (same ``layers.N...``
state_dict keys, same Conv2d/BatchNorm2d semantics, random init — no
download): any transposed kernel, BN-epsilon mismatch, or padding-placement
drift (flax 'SAME' vs torch p=k//2 on strided convs) fails at 1e-4.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

import jax  # noqa: E402

from gens_tpu.models.mnasnet import MnasNetEncoder, convert_torch_mnasnet  # noqa: E402

_BN_MOMENTUM = 1 - 0.9997  # torchvision mnasnet.py


class _InvertedResidual(nn.Module):
    """torchvision.models.mnasnet._InvertedResidual (same submodule names so
    state_dict keys match: ``...layers.{0,1,3,4,6,7}``)."""

    def __init__(self, in_ch, out_ch, kernel, stride, expand):
        super().__init__()
        mid = in_ch * expand
        self.apply_residual = in_ch == out_ch and stride == 1
        self.layers = nn.Sequential(
            nn.Conv2d(in_ch, mid, 1, bias=False),
            nn.BatchNorm2d(mid, momentum=_BN_MOMENTUM),
            nn.ReLU(inplace=True),
            nn.Conv2d(mid, mid, kernel, padding=kernel // 2, stride=stride,
                      groups=mid, bias=False),
            nn.BatchNorm2d(mid, momentum=_BN_MOMENTUM),
            nn.ReLU(inplace=True),
            nn.Conv2d(mid, out_ch, 1, bias=False),
            nn.BatchNorm2d(out_ch, momentum=_BN_MOMENTUM),
        )

    def forward(self, x):
        y = self.layers(x)
        return x + y if self.apply_residual else y


def _stack(in_ch, out_ch, kernel, stride, expand, repeats):
    blocks = [_InvertedResidual(in_ch, out_ch, kernel, stride, expand)]
    for _ in range(1, repeats):
        blocks.append(_InvertedResidual(out_ch, out_ch, kernel, 1, expand))
    return nn.Sequential(*blocks)


class MnasNetOracle(nn.Module):
    """torchvision.models.MNASNet(1.0) trunk (``layers`` only)."""

    def __init__(self):
        super().__init__()
        self.layers = nn.Sequential(
            nn.Conv2d(3, 32, 3, padding=1, stride=2, bias=False),
            nn.BatchNorm2d(32, momentum=_BN_MOMENTUM),
            nn.ReLU(inplace=True),
            nn.Conv2d(32, 32, 3, padding=1, stride=1, groups=32, bias=False),
            nn.BatchNorm2d(32, momentum=_BN_MOMENTUM),
            nn.ReLU(inplace=True),
            nn.Conv2d(32, 16, 1, bias=False),
            nn.BatchNorm2d(16, momentum=_BN_MOMENTUM),
            _stack(16, 24, 3, 2, 3, 3),
            _stack(24, 40, 5, 2, 3, 3),
            _stack(40, 80, 5, 2, 6, 3),
            _stack(80, 96, 3, 1, 6, 2),
            _stack(96, 192, 5, 2, 6, 4),
            _stack(192, 320, 3, 1, 6, 1),
        )


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    net = MnasNetOracle()
    # non-trivial running stats so a BN mean/var swap or epsilon drift shows
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
    net.eval()
    return net


def torch_stages(net, x):
    """Run the trunk, capturing the reference's 5 stage slices
    (feature_network_mnasnet.py:57-63: layers[0:8], [8], [9], [10:12],
    [12:14])."""
    outs = []
    with torch.no_grad():
        y = x
        for i in range(8):
            y = net.layers[i](y)
        outs.append(y)                       # enc1 1/2
        y = net.layers[8](y)
        outs.append(y)                       # enc2 1/4
        y = net.layers[9](y)
        outs.append(y)                       # enc3 1/8
        y = net.layers[10](y)
        y = net.layers[11](y)
        outs.append(y)                       # enc4 1/16
        y = net.layers[12](y)
        y = net.layers[13](y)
        outs.append(y)                       # enc5 1/32
    return [o.numpy() for o in outs]


def test_encoder_matches_torch_oracle(oracle):
    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    variables = convert_torch_mnasnet(state)

    rng = np.random.RandomState(0)
    # even, non-square size so any SAME-vs-torch padding asymmetry on the
    # stride-2 convs shows up
    x = rng.rand(2, 3, 64, 96).astype(np.float32)

    ref = torch_stages(oracle, torch.from_numpy(x))

    enc = MnasNetEncoder()
    outs = enc.apply(variables, np.transpose(x, (0, 2, 3, 1)))

    assert len(outs) == len(ref) == 5
    for i, (flax_o, torch_o) in enumerate(zip(outs, ref)):
        got = np.transpose(np.asarray(flax_o), (0, 3, 1, 2))
        assert got.shape == torch_o.shape, (
            f"stage {i}: {got.shape} vs {torch_o.shape}")
        scale = max(float(np.abs(torch_o).max()), 1e-6)
        err = np.abs(got - torch_o).max() / scale
        assert err < 1e-4, f"stage {i}: rel err {err:.2e}"


def test_converter_covers_all_encoder_params(oracle):
    """Every encoder param the flax module expects must be produced by the
    converter (a missing subtree would silently keep random init)."""
    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    variables = convert_torch_mnasnet(state)

    enc = MnasNetEncoder()
    init_vars = enc.init(jax.random.PRNGKey(0),
                         np.zeros((1, 32, 32, 3), np.float32))

    def paths(tree, prefix=()):
        if isinstance(tree, dict):
            out = []
            for k, v in tree.items():
                out += paths(v, prefix + (k,))
            return out
        return [prefix]

    expect = set(map(tuple, paths(init_vars["params"])))
    got = set(map(tuple, paths(variables["params"])))
    assert expect == got, (
        f"missing {sorted(expect - got)[:5]}, extra {sorted(got - expect)[:5]}")

    expect_s = set(map(tuple, paths(init_vars["batch_stats"])))
    got_s = set(map(tuple, paths(variables["batch_stats"])))
    assert expect_s == got_s
