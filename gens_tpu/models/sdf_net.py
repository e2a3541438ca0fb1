"""SDF network: NeuS-style geometric-init MLP conditioned on multi-scale
volume features (re-design of /root/reference/models/modules/sdf_network.py).

The volume features are trilinearly sampled at the query point
(``lookup_volume_cascade``), positionally encoded, and concatenated into
every hidden layer (sdf_network.py:98-123). Weight normalization and the
geometric initialization (zeroed feature columns, sphere bias) follow
sdf_network.py:52-95.

Gradients: the reference computes first- AND second-order point gradients
with ``torch.autograd.grad(create_graph=True)`` (sdf_network.py:131-153),
which forces the custom CUDA double-backward grid-sample. Here
``sdf_gradients`` is two nested ``jax.grad`` calls — autodiff composes
through the gather+lerp trilerp to any order.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gens_tpu.config import SDFNetConfig
from gens_tpu.models.embedder import positional_encoding, positional_encoding_dim
from gens_tpu.ops.interp import (DiffPackedCascade, FusedCascade,
                                 PackedVolume, lookup_cascade_fused,
                                 lookup_volume_cascade,
                                 lookup_volume_cascade_packed,
                                 lookup_volume_cascade_packed_diff,
                                 lookup_volume_cascade_supercell,
                                 pack_cascade, pack_cascade_supercell)


class WNLinear(nn.Module):
    """Linear layer with weight normalization (w = g * v / ||v||, norm over
    input dims per output unit — torch ``weight_norm`` dim=0 semantics)."""

    features: int
    w_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    b_init: nn.initializers.Initializer = nn.initializers.zeros_init()
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x):
        d_in = x.shape[-1]
        v = self.param("v", self.w_init, (d_in, self.features))
        b = self.param("b", self.b_init, (self.features,))
        if self.use_weight_norm:
            # g initialized to ||v|| of the ACTUAL v draw (closure over its
            # init-time value) so the initial effective weight equals v,
            # matching torch.nn.utils.weight_norm at init.
            g = self.param(
                "g",
                lambda key, shape: jnp.linalg.norm(v, axis=0),
                (self.features,),
            )
            w = v * (g / (jnp.linalg.norm(v, axis=0) + 1e-12))[None, :]
        else:
            w = v
        # params stay f32; follow the activation dtype at matmul time so a
        # bf16 compute path (SDFNetConfig.mlp_dtype) halves activation HBM
        return x @ w.astype(x.dtype) + b.astype(x.dtype)


def _softplus100(x):
    # Softplus(beta=100) (sdf_network.py:95); numerically safe form.
    return jax.nn.softplus(x * 100.0) / 100.0


class SDFNetwork(nn.Module):
    cfg: SDFNetConfig

    def setup(self):
        c = self.cfg
        d_in = positional_encoding_dim(c.multires, c.d_in)
        d_feat = positional_encoding_dim(c.feat_multires, c.feat_channels)
        dims = [d_in] + [c.d_hidden + d_feat for _ in range(c.n_layers)] + [c.d_out]
        self.dims = dims
        self.d_in_embedded = d_in
        self.d_feat_embedded = d_feat
        num_layers = len(dims)

        layers = []
        for l in range(num_layers - 1):
            out_dim = dims[l + 1]
            if l + 1 in c.skip_in:
                out_dim -= dims[0]
            if l < num_layers - 2:
                out_dim -= d_feat
            assert out_dim > 0, (
                f"layer {l}: non-positive width {out_dim}; d_hidden must "
                f"exceed the PE input dim ({dims[0]}) for skip layers")

            if c.geometric_init:
                w_init = self._geo_w_init(l, num_layers, dims, out_dim, d_feat)
                b_init = self._geo_b_init(l, num_layers, d_feat)
            else:
                w_init = nn.initializers.lecun_normal()
                b_init = nn.initializers.zeros_init()
            layers.append(
                WNLinear(out_dim, w_init=w_init, b_init=b_init,
                         use_weight_norm=c.weight_norm, name=f"lin{l}")
            )
        self.layers = layers

    def _geo_w_init(self, l, num_layers, dims, out_dim, d_feat):
        c = self.cfg

        def init(key, shape):
            d_in_l, d_out_l = shape
            if l == num_layers - 2:
                mean = math.sqrt(math.pi) / math.sqrt(d_in_l)
                if c.inside_outside:
                    mean = -mean
                w = mean + 1e-4 * jax.random.normal(key, shape)
                # zero the volume-feature columns (sdf_network.py:72)
                w = w.at[-d_feat:, :].set(0.0)
            elif c.multires > 0 and l == 0:
                w = jnp.zeros(shape)
                std = math.sqrt(2) / math.sqrt(d_out_l)
                w = w.at[:3, :].set(std * jax.random.normal(key, (3, d_out_l)))
            elif c.multires > 0 and l in c.skip_in:
                std = math.sqrt(2) / math.sqrt(d_out_l)
                w = std * jax.random.normal(key, shape)
                # zero the PE-tail of the skip input + feature columns
                # (sdf_network.py:83)
                ncols = dims[0] - 3 + d_feat
                w = w.at[-ncols:, :].set(0.0)
            else:
                std = math.sqrt(2) / math.sqrt(d_out_l)
                w = std * jax.random.normal(key, shape)
                w = w.at[-d_feat:, :].set(0.0)
            return w

        return init

    def _geo_b_init(self, l, num_layers, d_feat):
        c = self.cfg

        def init(key, shape):
            b = jnp.zeros(shape)
            if l == num_layers - 2:
                bias = c.bias if c.inside_outside else -c.bias
                b = jnp.full(shape, bias)
                b = b.at[-d_feat:].set(0.0)  # sdf_network.py:73
            return b

        return init

    def __call__(self, pts: jnp.ndarray, volumes: Sequence[jnp.ndarray],
                 with_mask: bool = False) -> jnp.ndarray:
        """pts (N, 3) -> (N, d_out): [sdf, latent...].

        ``with_mask=True`` (requires a :class:`FusedCascade` with a mask
        section) additionally returns the nearest-neighbour voxel mask (N,)
        riding in the SAME gather as the cascade features — the render
        core's per-point mask probe for free.
        """
        c = self.cfg
        mask = None
        if isinstance(volumes, FusedCascade):
            # fused inference path: one gather for all scales (+ mask)
            if with_mask:
                feats, mask = lookup_cascade_fused(volumes, pts,
                                                   with_mask=True)
            else:
                feats = lookup_cascade_fused(volumes, pts)
            feats = feats.astype(jnp.float32)
        elif isinstance(volumes, DiffPackedCascade):
            # training fast path: forward reads the packed tables (one wide
            # gather per scale), gradients scatter into the RAW volumes —
            # the pack conv appears in no backward (interp.py packed-diff)
            feats = lookup_volume_cascade_packed_diff(volumes, pts)
            feats = feats.astype(jnp.float32)
        elif isinstance(volumes[0], PackedVolume):
            # supercell-packed lookup: ONE wide (27C-channel) gather per
            # scale instead of 8 narrow ones — TPU gathers are
            # addressing-bound, so row width is nearly free (interp.py
            # pack_supercell). The caller packed once per scene
            # (GenSModel.build_scene); dtype was chosen at pack time.
            feats = lookup_volume_cascade_supercell(volumes, pts)
            feats = feats.astype(jnp.float32)
        elif c.packed_trilerp:
            # packed lookup requested but raw volumes given (e.g. finetune,
            # where the volumes are trained parameters): pack inline with a
            # stop_gradient and route gradients to the raw volumes through
            # the packed-diff chain (XLA CSE merges the repeated packs
            # inside one jit; the pack conv's pathological backward never
            # materializes)
            packed = pack_cascade_supercell(
                [jax.lax.stop_gradient(v) for v in volumes],
                dtype=(jnp.bfloat16 if c.volume_dtype == "bfloat16" else None))
            feats = lookup_volume_cascade_packed_diff(
                DiffPackedCascade(list(volumes), packed), pts)
            feats = feats.astype(jnp.float32)
        elif c.fused_cascade and len({v.shape[-1] for v in volumes}) == 1:
            # fused path: one gather for the whole cascade (and one scatter
            # in the backward) instead of scales x 8 corners
            flat, shapes, offsets = pack_cascade(volumes)
            if c.volume_dtype == "bfloat16":
                flat = flat.astype(jnp.bfloat16)
            feats = lookup_volume_cascade_packed(flat, shapes, offsets, pts)
            feats = feats.astype(jnp.float32)
        else:
            if c.volume_dtype == "bfloat16":
                volumes = [v.astype(jnp.bfloat16) for v in volumes]
            feats = lookup_volume_cascade(volumes, pts)
            feats = feats.astype(jnp.float32)
        feats = positional_encoding(feats, c.feat_multires)

        inputs = positional_encoding(pts * c.scale, c.multires)

        # PE runs f32 for angular accuracy; the MLP itself can run bf16
        # (mlp_dtype) — the fused derivative passes are bandwidth-bound on
        # the per-layer activations, which this halves. Output returns f32.
        cdt = jnp.bfloat16 if c.mlp_dtype == "bfloat16" else jnp.float32
        feats = feats.astype(cdt)
        inputs = inputs.astype(cdt)

        x = inputs
        num_layers = len(self.dims)
        for l in range(num_layers - 1):
            if l in c.skip_in:
                x = jnp.concatenate([x, inputs], axis=-1) / math.sqrt(2)
            if 0 < l < num_layers - 1:
                x = jnp.concatenate([x, feats], axis=-1)
            x = self.layers[l](x)
            if l < num_layers - 2:
                x = _softplus100(x)
        x = x.astype(jnp.float32)
        out = jnp.concatenate([x[..., :1] / c.scale, x[..., 1:]], axis=-1)
        if with_mask:
            assert mask is not None, \
                "with_mask requires a FusedCascade with a mask section"
            return out, mask
        return out

    def sdf(self, pts, volumes):
        return self(pts, volumes)[..., 0]

    def sdf_and_mask(self, pts, volumes):
        """(sdf (N,), mask (N,)) from one fused gather (FusedCascade only)."""
        out, mask = self(pts, volumes, with_mask=True)
        return out[..., 0], mask


def sdf_with_gradients(module: SDFNetwork, params, pts: jnp.ndarray,
                       volumes) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """First- and second-order point derivatives of the SDF.

    Returns ``(gradients (N,3), smooth (N,3))`` where
    ``smooth_i = sum_j d²sdf / dx_i dx_j`` — exactly the reference's
    ``grad(grad(sdf) @ ones)`` (sdf_network.py:145-152). Differentiable
    w.r.t. ``params`` and ``volumes`` (third-order total).
    """

    def sdf_sum(p):
        return module.apply(params, p, volumes, method=SDFNetwork.sdf).sum()

    # forward-over-reverse: one jvp through the gradient yields the gradient
    # (primal) and the Hessian-times-ones (tangent) in a single fused pass.
    # By Hessian symmetry J_g·1 == ∇(Σ_j g_j), the reference's
    # grad(grad(sdf) @ ones) — same math, ~40% fewer MLP/trilerp passes.
    gradients, smooth = jax.jvp(
        jax.grad(sdf_sum), (pts,), (jnp.ones_like(pts),))
    return gradients, smooth
