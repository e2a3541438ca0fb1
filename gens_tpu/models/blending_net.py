"""IBRNet-style source-view color blending network.

Re-design of /root/reference/models/modules/blending_network.py:22-118:
per-sample, per-source-view warped RGB+features plus a ray-difference
embedding are fused by weighted cross-view mean/variance, refined by
visibility MLPs, and softmax-blended over source views into an RGB value.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gens_tpu.config import BlendingNetConfig

_he = nn.initializers.he_normal()


def _fused_mean_variance(x, weight):
    # blending_network.py:15-19
    mean = jnp.sum(x * weight, axis=1, keepdims=True)
    var = jnp.sum(weight * (x - mean) ** 2, axis=1, keepdims=True)
    return mean, var


class MLP(nn.Module):
    features: tuple
    final_act: str = "elu"  # elu | sigmoid | none
    dtype: object = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, kernel_init=_he, dtype=self.dtype)(x)
            if i < len(self.features) - 1:
                x = nn.elu(x)
        if self.final_act == "elu":
            x = nn.elu(x)
        elif self.final_act == "sigmoid":
            x = nn.sigmoid(x)
        return x


class BlendingNetwork(nn.Module):
    cfg: BlendingNetConfig

    @nn.compact
    def __call__(self, rgb_feat: jnp.ndarray, ray_diff: jnp.ndarray,
                 mask: jnp.ndarray) -> jnp.ndarray:
        """rgb_feat (N, S, 3+C); ray_diff (N, S, 4); mask (N, S) -> rgb (N, 3)."""
        c = self.cfg
        # optional bf16 compute (params stay f32): the blending stack is
        # bandwidth-bound on the (N, S, C) activations
        cdt = jnp.bfloat16 if c.mlp_dtype == "bfloat16" else None
        if cdt is not None:
            rgb_feat = rgb_feat.astype(cdt)
            ray_diff = ray_diff.astype(cdt)
        mask = mask[..., None].astype(rgb_feat.dtype)  # (N, S, 1)
        num_views = rgb_feat.shape[1]

        direction_feat = MLP((16, c.d_feature + 3), dtype=cdt)(ray_diff)
        rgb_in = rgb_feat[..., :3]
        rgb_feat = rgb_feat + direction_feat

        if c.anti_alias_pooling:
            s = self.param("s", lambda k: jnp.asarray(0.2, jnp.float32))
            dot_prod = ray_diff[..., 3:4]
            exp_dot = jnp.exp(jnp.abs(s).astype(rgb_feat.dtype)
                              * (dot_prod - 1.0))
            weight = (exp_dot - jnp.min(exp_dot, axis=1, keepdims=True)) * mask
            weight = weight / (jnp.sum(weight, axis=1, keepdims=True) + 1e-8)
        else:
            weight = mask / (jnp.sum(mask, axis=1, keepdims=True) + 1e-8)

        mean, var = _fused_mean_variance(rgb_feat, weight)
        globalfeat = jnp.concatenate([mean, var], axis=-1)  # (N, 1, 2F)

        x = jnp.concatenate(
            [jnp.broadcast_to(globalfeat, (globalfeat.shape[0], num_views,
                                           globalfeat.shape[-1])), rgb_feat],
            axis=-1,
        )
        x = MLP((64, 32), dtype=cdt)(x)

        x_vis = MLP((32, 33), dtype=cdt)(x * weight)
        x_res, vis = x_vis[..., :-1], x_vis[..., -1:]
        vis = nn.sigmoid(vis) * mask
        x = x + x_res
        vis = MLP((32, 1), final_act="sigmoid", dtype=cdt)(x * vis) * mask

        x = jnp.concatenate([x, vis, ray_diff], axis=-1)
        x = MLP((16, 8, 1), final_act="none", dtype=cdt)(x)
        # blend weights in f32: softmax over a masked -1e9 logit
        x = jnp.where(mask == 0, -1e9, x.astype(jnp.float32))
        blend = jax.nn.softmax(x, axis=1)
        return jnp.sum(rgb_in.astype(jnp.float32) * blend, axis=1)


class SingleVarianceNetwork(nn.Module):
    """NeuS single learnable inv-variance (variance_network.py:5-11)."""

    init_val: float = 0.3

    @nn.compact
    def __call__(self):
        v = self.param("variance", lambda k: jnp.asarray(self.init_val, jnp.float32))
        return jnp.exp(v * 10.0)
