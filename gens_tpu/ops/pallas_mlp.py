"""Pallas TPU kernel: fused SDF-MLP forward.

The SDF network is the hottest compute op in the framework (SURVEY.md §3:
evaluated at every ray sample, at 512³ grid points during mesh extraction,
and re-evaluated inside first/second-order gradients). XLA executes it as a
chain of matmuls with every intermediate activation round-tripping HBM; this
kernel keeps ALL weights and intermediates resident in VMEM and streams
point tiles through the MXU, eliminating the intermediate traffic.

Scope: gradient-free paths (mesh extraction / SDF-grid evaluation). Training
keeps the jnp implementation, whose arbitrary-order autodiff is the point of
the design (ops/interp.py docstring).

The kernel reproduces the reference MLP structure exactly
(sdf_network.py:98-123): PE(x) input, volume features concatenated into
every hidden layer, skip concat of the input at ``skip_in`` layers scaled by
1/sqrt(2), Softplus(beta=100), weight-norm folded into the weights on the
host side.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gens_tpu.config import SDFNetConfig
from gens_tpu.models.embedder import positional_encoding, positional_encoding_dim


def _effective_weights(params, cfg: SDFNetConfig):
    """Fold weight norm (w = g * v / ||v||) into dense (W, b) pairs."""
    tree = params["params"] if "params" in params else params
    out = []
    n_layers = cfg.n_layers + 1
    for l in range(n_layers):
        leaf = tree[f"lin{l}"]
        v = leaf["v"]
        b = leaf["b"]
        if "g" in leaf:
            w = v * (leaf["g"] / (jnp.linalg.norm(v, axis=0) + 1e-12))[None]
        else:
            w = v
        out.append((w, b))
    return out


def _mlp_kernel(cfg: SDFNetConfig, n_weights: int, x_ref, feat_ref,
                *refs):
    """Pallas kernel body. refs = [w0, b0, w1, b1, ..., out_ref]."""
    out_ref = refs[-1]
    wbs = [(refs[2 * i], refs[2 * i + 1]) for i in range(n_weights)]

    x_pe = x_ref[:]
    feats = feat_ref[:]

    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    num_layers = cfg.n_layers + 2  # dims length

    h = x_pe
    for l in range(num_layers - 1):
        if l in cfg.skip_in:
            h = jnp.concatenate([h, x_pe], axis=-1) * inv_sqrt2
        if 0 < l < num_layers - 1:
            h = jnp.concatenate([h, feats], axis=-1)
        w, b = wbs[l]
        h = jnp.dot(h, w[:], preferred_element_type=jnp.float32) + b[:]
        if l < num_layers - 2:
            # softplus(beta=100)
            h = jax.nn.softplus(h * 100.0) / 100.0
    out_ref[:] = h


def sdf_mlp_fused(params, cfg: SDFNetConfig, x_pe: jnp.ndarray,
                  feats_pe: jnp.ndarray, tile: int = 512,
                  interpret: bool = False) -> jnp.ndarray:
    """Run the fused MLP on pre-encoded inputs.

    x_pe: (N, PE(xyz)) already scaled+encoded; feats_pe: (N, PE(feats)).
    N must be a multiple of ``tile`` (callers pad). Returns (N, d_out)
    RAW head output (caller divides sdf channel by cfg.scale).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = x_pe.shape[0]
    assert N % tile == 0, (N, tile)
    wbs = _effective_weights(params, cfg)

    weight_args = []
    weight_specs = []
    for w, b in wbs:
        weight_args += [w, b]
        weight_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]

    grid = (N // tile,)
    kernel = functools.partial(_mlp_kernel, cfg, len(wbs))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, x_pe.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, feats_pe.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + weight_specs,
        out_specs=pl.BlockSpec((tile, cfg.d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, cfg.d_out), jnp.float32),
        interpret=interpret,
    )(x_pe, feats_pe, *weight_args)
    return out


def sdf_fused_fn(sdf_params, cfg: SDFNetConfig, volumes,
                 tile: int = 512, interpret: bool = False):
    """Drop-in gradient-free replacement for ``Renderer.sdf_fn``: packed
    cascade lookup + PE + fused Pallas MLP. pts count must be padded to a
    multiple of ``tile`` by the caller (eval_sdf_grid blocks satisfy this)."""
    from gens_tpu.ops.interp import lookup_volume_cascade_packed, pack_cascade

    flat, shapes, offsets = pack_cascade(volumes)

    def f(pts):
        n = pts.shape[0]
        pad = (-n) % tile
        if pad:
            pts_p = jnp.concatenate(
                [pts, jnp.zeros((pad, 3), pts.dtype)], axis=0)
        else:
            pts_p = pts
        feats = lookup_volume_cascade_packed(flat, shapes, offsets, pts_p)
        feats_pe = positional_encoding(feats, cfg.feat_multires)
        x_pe = positional_encoding(pts_p * cfg.scale, cfg.multires)
        out = sdf_mlp_fused(sdf_params, cfg, x_pe, feats_pe, tile=tile,
                            interpret=interpret)
        return out[:n, 0] / cfg.scale

    return f
