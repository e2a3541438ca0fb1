"""Training losses (re-design of /root/reference/models/losses/loss.py and
ncc.py).

Every masked reduction is computed as a (numerator, denominator) pair and
optionally ``psum``-ed over a mesh axis before dividing, so sharding the ray
batch / pseudo points over devices reproduces the single-device loss
EXACTLY (SURVEY.md §2.3: the distribution is lossless).

The LNCC simplifies sharply in this framework: the reference computes patch
sums with an all-ones conv2d and reads the center pixel (ncc.py:24-33) —
that is exactly a sum over the whole patch, so here it is a single
``sum(axis=patch)``.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from gens_tpu.config import LossConfig
from gens_tpu.ops.interp import safe_norm


def _ratio(num, den, axis_name: Optional[str], eps: float):
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / (den + eps)


def compute_lncc(ref_gray: jnp.ndarray, src_grays: jnp.ndarray) -> jnp.ndarray:
    """Patchwise normalized cross-correlation, best-2 source views.

    ref_gray: (N, P², C); src_grays: (S, N, P², C).
    Returns ncc (N, 1) in [0, 2] (0 = perfect correlation).
    Reference ncc.py:7-51.
    """
    S, N, P2, C = src_grays.shape
    src = jnp.transpose(src_grays, (1, 0, 3, 2))          # (N, S, C, P²)
    ref = jnp.transpose(ref_gray, (0, 2, 1))[:, None]     # (N, 1, C, P²)

    ref_sum = ref.sum(-1)                                  # (N, 1, C)
    src_sum = src.sum(-1)                                  # (N, S, C)
    ref_sq_sum = (ref ** 2).sum(-1)
    src_sq_sum = (src ** 2).sum(-1)
    ref_src_sum = (ref * src).sum(-1)                      # (N, S, C)

    n = P2
    u_ref = ref_sum / n
    u_src = src_sum / n

    cross = ref_src_sum - u_src * ref_sum - u_ref * src_sum + u_ref * u_src * n
    ref_var = ref_sq_sum - 2 * u_ref * ref_sum + u_ref * u_ref * n
    src_var = src_sq_sum - 2 * u_src * src_sum + u_src * u_src * n

    cc = cross * cross / (ref_var * src_var + 1e-5)        # (N, S, C)
    ncc = jnp.clip(1.0 - cc, 0.0, 2.0).mean(axis=2)        # (N, S)

    # best-2 (smallest) source views averaged (ncc.py:48-49)
    k = min(2, S)
    best = -jax.lax.top_k(-ncc, k)[0]
    return best.mean(axis=1, keepdims=True)                # (N, 1)


def compute_losses(preds: Dict, targets: Dict, cfg: LossConfig,
                   axis_name: Optional[str] = None) -> Dict:
    """Weighted loss aggregation (loss.py:23-84). ``preds`` from the
    renderer, ``targets`` from the data pipeline. With ``axis_name``, all
    masked reductions are psum-ed over that mesh axis (ray/point shards)."""
    valid_mask = preds["valid_mask"].astype(jnp.float32)  # (R,1)

    # masked L1; the normalizer counts valid RAYS, not elements — the rgb
    # channel sum stays in the numerator (loss.py:25-26)
    color_err = jnp.abs(preds["color_fine"] - targets["color"])
    color_loss = _ratio(jnp.sum(color_err * valid_mask), valid_mask.sum(),
                        axis_name, 1e-5)

    # Eikonal: sum over relaxed-sphere samples / their count
    # (implicit_surface.py:249-250)
    relax = preds["relax_inside_sphere"]
    eikonal_loss = _ratio(jnp.sum(relax * preds["grad_sq_err"]), relax.sum(),
                          axis_name, 1e-5)

    # sparse SDF regularizer (loss.py:30)
    sp = jnp.exp(-jnp.abs(preds["sparse_sdf"]) * cfg.sparse_scale_factor)
    sparse_loss = _ratio(sp.sum(), jnp.asarray(sp.size, jnp.float32),
                         axis_name, 0.0)

    # surface smoothness (implicit_surface.py:252-253): mean over rays
    sm = safe_norm(preds["smooth_sur"], axis=-1)
    smooth_loss = _ratio(sm.sum(), jnp.asarray(sm.size, jnp.float32),
                         axis_name, 0.0)

    # TV is computed from the (replicated) volumes — identical across ray
    # shards, no reduction needed
    tv_loss = preds["tv_reg"]

    ncc = compute_lncc(preds["ref_gray_val"], preds["sampled_gray_val"])
    ncc_mask = valid_mask * preds["mid_inside_sphere"]
    mfc_loss = 0.5 * _ratio(jnp.sum(ncc * ncc_mask), ncc_mask.sum(),
                            axis_name, 1e-8)

    if "pseudo_sdf" in preds:
        ps = jnp.abs(preds["pseudo_sdf"])
        pseudo_sdf_loss = _ratio(ps.sum(), jnp.asarray(ps.size, jnp.float32),
                                 axis_name, 0.0)
    else:
        pseudo_sdf_loss = jnp.asarray(0.0)

    if "pseudo_depth" in targets:
        pd = targets["pseudo_depth"]
        pd_mask = (pd > 0).astype(jnp.float32)
        pseudo_depth_loss = _ratio(
            jnp.sum(jnp.abs(preds["render_depth"] - pd) * pd_mask),
            pd_mask.sum(), axis_name, 1e-8)
    else:
        pseudo_depth_loss = jnp.asarray(0.0)

    if "depth" in targets:
        d = targets["depth"]
        d_mask = (d > 0).astype(jnp.float32)
        depth_loss = _ratio(
            jnp.sum(jnp.abs(preds["render_depth"] - d) * d_mask),
            d_mask.sum(), axis_name, 1e-8)
    else:
        depth_loss = jnp.asarray(0.0)

    loss = (
        color_loss * cfg.color_weight
        + eikonal_loss * cfg.igr_weight
        + sparse_loss * cfg.sparse_weight
        + mfc_loss * cfg.mfc_weight
        + smooth_loss * cfg.smooth_weight
        + tv_loss * cfg.tv_weight
        + pseudo_sdf_loss * cfg.pseudo_sdf_weight
        + pseudo_depth_loss * cfg.pseudo_depth_weight
        + depth_loss * cfg.depth_weight
    )

    return {
        "loss": loss,
        "color_loss": color_loss,
        "eikonal_loss": eikonal_loss,
        "sparse_loss": sparse_loss,
        "mfc_loss": mfc_loss,
        "smooth_loss": smooth_loss,
        "tv_loss": tv_loss,
        "depth_loss": depth_loss,
        "pseudo_sdf_loss": pseudo_sdf_loss,
        "pseudo_depth_loss": pseudo_depth_loss,
    }
