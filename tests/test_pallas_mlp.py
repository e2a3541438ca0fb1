"""Fused Pallas SDF-MLP vs the flax reference implementation (interpret mode
on CPU; the compiled path is exercised on TPU by mesh extraction)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gens_tpu.config import SDFNetConfig
from gens_tpu.models.sdf_net import SDFNetwork
from gens_tpu.ops.pallas_mlp import sdf_fused_fn, sdf_mlp_fused
from gens_tpu.models.embedder import positional_encoding


@pytest.fixture(scope="module")
def sdf_setup(request):
    rng = np.random.RandomState(0)
    cfg = SDFNetConfig(d_out=17, d_hidden=48, n_layers=4, skip_in=(2,),
                       multires=4, feat_channels=8, feat_multires=2)
    net = SDFNetwork(cfg)
    vols = [jnp.asarray(rng.rand(8 >> i, 8 >> i, 8 >> i, 4).astype(np.float32))
            for i in range(2)]
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), pts, vols)
    return cfg, net, params, vols, pts


def test_fused_mlp_matches_reference(sdf_setup):
    cfg, net, params, vols, pts = sdf_setup
    ref = np.asarray(net.apply(params, pts, vols))

    from gens_tpu.ops.interp import (lookup_volume_cascade_packed,
                                     pack_cascade)

    flat, shapes, offsets = pack_cascade(vols)
    feats = lookup_volume_cascade_packed(flat, shapes, offsets, pts)
    feats_pe = positional_encoding(feats, cfg.feat_multires)
    x_pe = positional_encoding(pts * cfg.scale, cfg.multires)
    got = np.array(sdf_mlp_fused(params, cfg, x_pe, feats_pe, tile=32,
                                 interpret=True))
    # raw head vs reference output: reference divides channel 0 by scale
    got[:, 0] /= cfg.scale
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_fused_sdf_fn_with_padding(sdf_setup):
    cfg, net, params, vols, pts = sdf_setup
    f = sdf_fused_fn(params, cfg, vols, tile=32, interpret=True)
    got = np.asarray(f(pts[:50]))  # 50 not a multiple of 32 -> padded
    ref = np.asarray(net.apply(params, pts[:50], vols,
                               method=SDFNetwork.sdf))
    assert got.shape == (50,)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
