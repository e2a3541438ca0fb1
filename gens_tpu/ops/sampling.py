"""Ray sampling: stratified init, inverse-CDF importance sampling and the
NeuS hierarchical up-sampling loop — static shapes throughout.

Re-design of /root/reference/models/modules/implicit_surface.py:14-133
(sample_pdf, up_sample, cat_z_vals). The reference gates new-sample SDF
evaluation on a data-dependent boolean mask (implicit_surface.py:121-126),
which is hostile to XLA; here out-of-volume points are evaluated densely and
overwritten with the sentinel ``SDF_SENTINEL`` via ``jnp.where`` — same math,
static shapes (SURVEY.md §7.1.2).
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from gens_tpu.ops.interp import lookup_mask_cascade, lookup_mask

# out-of-volume SDF sentinel (reference implicit_surface.py:125,181: sdf=100)
SDF_SENTINEL = 100.0


def sample_pdf(bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int,
               key=None) -> jnp.ndarray:
    """NeRF inverse-CDF sampling (reference implicit_surface.py:14-44).

    bins: (R, B); weights: (R, B-1). Deterministic (midpoint u) when ``key``
    is None, stratified-random otherwise. Returns (R, n_samples).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (R, B)

    if key is None:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))

    # dense comparison instead of the default binary-search lowering: at
    # (R~1k, B~65, n~16) the 1M-element compare is one clean VPU pass while
    # 'scan' is a log(B)-step fori_loop of dynamic slices (TPU-hostile)
    inds = jax.vmap(lambda c, uu: jnp.searchsorted(
        c, uu, side="right", method="compare_all"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_lo = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_hi = jnp.take_along_axis(cdf, above, axis=-1)
    bins_lo = jnp.take_along_axis(bins, below, axis=-1)
    bins_hi = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_lo) / denom
    return bins_lo + t * (bins_hi - bins_lo)


def up_sample_weights(pts: jnp.ndarray, z_vals: jnp.ndarray, sdf: jnp.ndarray,
                      mask_any: jnp.ndarray, inv_s: float,
                      voxel_mask: jnp.ndarray = None) -> jnp.ndarray:
    """Section weights for one NeuS up-sampling round at fixed ``inv_s``.

    pts: (R, S, 3) the sample points; z_vals: (R, S); sdf: (R, S);
    mask_any: combined finest-resolution mask volume. ``voxel_mask`` (R, S)
    skips the per-point mask gather when the caller already carries it
    (hierarchical_sample merges it alongside the SDF).
    Reference implicit_surface.py:60-107. Returns weights (R, S-1).
    """
    R, S = z_vals.shape

    if voxel_mask is None:
        voxel_mask = lookup_mask(mask_any, pts.reshape(-1, 3))
        voxel_mask = voxel_mask.reshape(R, S)
    seg_mask = voxel_mask[:, :-1] * voxel_mask[:, 1:]

    radius = jnp.linalg.norm(pts, axis=-1)
    inside_sphere = ((radius[:, :-1] < 1.0) | (radius[:, 1:] < 1.0)) & (seg_mask > 0)

    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
    mid_sdf = 0.5 * (prev_sdf + next_sdf)
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)

    # running min with the previous section's cos for robustness
    # (reference implicit_surface.py:94-97)
    prev_cos = jnp.concatenate([jnp.zeros_like(cos_val[:, :1]), cos_val[:, :-1]], axis=-1)
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside_sphere.astype(cos_val.dtype)

    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)

    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[:, :1]), 1.0 - alpha + 1e-7], axis=-1),
        axis=-1,
    )[:, :-1]
    return alpha * trans


def merge_z_vals(z_vals: jnp.ndarray, sdf: jnp.ndarray, new_z: jnp.ndarray,
                 new_sdf: jnp.ndarray, *extra_pairs) -> Tuple[jnp.ndarray, ...]:
    """Sorted merge of existing and new samples with their SDF values
    (reference cat_z_vals, implicit_surface.py:111-133) — static shapes.

    ``extra_pairs``: optional further (old, new) array pairs carried through
    the same sort (e.g. the per-sample voxel mask). Returns
    (z_sorted, sdf_sorted, *extras_sorted)."""
    assert len(extra_pairs) % 2 == 0
    cols = [jnp.concatenate([z_vals, new_z], axis=-1),
            jnp.concatenate([sdf, new_sdf], axis=-1)]
    for old, new in zip(extra_pairs[::2], extra_pairs[1::2]):
        cols.append(jnp.concatenate([old, new], axis=-1))
    # one fused variadic sort instead of argsort + N gathers
    return jax.lax.sort(tuple(cols), dimension=-1, num_keys=1)


def hierarchical_sample(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    mask_any: jnp.ndarray,
    n_samples: int,
    n_importance: int,
    up_sample_steps: int,
    perturb_key=None,
    masked_sdf=None,
) -> jnp.ndarray:
    """Full NeuS sampling: stratified init + ``up_sample_steps`` rounds of
    importance sampling with inv_s = 64·2^i (reference
    implicit_surface.py:351-393). Returns z_vals (R, n_samples+n_importance).

    ``sdf_fn`` maps (N, 3) points to (N,) SDF; callers pass a masked version
    (out-of-volume -> SDF_SENTINEL). No gradients flow through sampling
    (the reference wraps it in no_grad); we stop_gradient the result.
    """
    R = rays_o.shape[0]
    t = jnp.linspace(0.0, 1.0, n_samples)
    # near/far may be per-ray (R, 1) or scene-wide (1, 1): broadcast to (R, S)
    z_vals = jnp.broadcast_to(near + (far - near) * t[None, :], (R, n_samples))

    if perturb_key is not None:
        t_rand = jax.random.uniform(perturb_key, (R, 1)) - 0.5
        z_vals = z_vals + t_rand * 2.0 / n_samples

    if n_importance <= 0:
        return z_vals

    if masked_sdf is None:
        def masked_sdf(pts_flat):
            sdf = sdf_fn(pts_flat)
            m = lookup_mask(mask_any, pts_flat)
            return jnp.where(m > 0, sdf, SDF_SENTINEL), m

    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    sdf, vmask = masked_sdf(pts.reshape(-1, 3))
    sdf = sdf.reshape(R, n_samples)
    # carry the voxel mask through the merges instead of re-gathering it for
    # every sample each round (old samples' masks never change)
    vmask = vmask.reshape(R, n_samples)

    n_per_step = n_importance // up_sample_steps
    for i in range(up_sample_steps):
        weights = up_sample_weights(pts, z_vals, sdf, mask_any, 64.0 * 2 ** i,
                                    voxel_mask=vmask)
        new_z = sample_pdf(z_vals, weights, n_per_step)
        new_pts = rays_o[:, None, :] + rays_d[:, None, :] * new_z[..., None]
        if i + 1 < up_sample_steps:
            new_sdf, new_mask = masked_sdf(new_pts.reshape(-1, 3))
            new_sdf = new_sdf.reshape(R, n_per_step)
            new_mask = new_mask.reshape(R, n_per_step)
        else:
            # last round: SDF no longer needed (reference last=True branch)
            new_sdf = jnp.full((R, n_per_step), SDF_SENTINEL, z_vals.dtype)
            new_mask = jnp.zeros((R, n_per_step), vmask.dtype)
        z_vals, sdf, vmask = merge_z_vals(z_vals, sdf, new_z, new_sdf,
                                          vmask, new_mask)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]

    return jax.lax.stop_gradient(z_vals)
