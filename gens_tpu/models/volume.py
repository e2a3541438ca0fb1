"""Cascaded global feature-volume construction by cross-view mean/variance
aggregation.

Re-design of /root/reference/models/modules/volume.py:13-63 (``agg_mean_var``):
for each cascade scale, voxel centers of a [-1,1]^3 grid are projected into
every view with scale-adjusted intrinsics, view features are bilinearly
sampled, and per-voxel masked mean + variance across views form the raw
volume; a voxel is valid when seen by strictly more than ``min_vis_view``
views (volume.py:58).

Distribution: the aggregation is expressed as three sums —
``psum(f·m), psum(f²·m), psum(m)`` — so sharding the VIEW axis over a device
mesh is a lossless all-reduce (SURVEY.md §2.3). Pass ``axis_name`` inside a
``shard_map`` to enable it; padded views with mask=0 contribute nothing, so
uneven view counts pad cleanly.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as _nn
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

from gens_tpu.ops.interp import (bilerp, bilerp_packed_diff, bilerp_supercell,
                                 bilerp_supercell_mixed, pack_supercell2d)
from gens_tpu.ops.projection import scale_intrinsics


def voxel_grid(dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """(dim³, 3) voxel-center xyz coordinates of an align-corners grid over
    [-1,1]³, x fastest-varying last (meshgrid 'ij' on (x,y,z) like
    volume.py:28-30).

    The linspace is wrapped in an optimization barrier: without it XLA
    constant-folds the whole dim³x3 grid (and everything derived from it)
    at compile time, which blows up compilation at 256³.
    """
    r = jax.lax.optimization_barrier(jnp.linspace(-1.0, 1.0, dim, dtype=dtype))
    gx, gy, gz = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)


def aggregate_scale(feat: jnp.ndarray, intrs: jnp.ndarray, c2ws: jnp.ndarray,
                    dim: int, scale_idx: int, min_vis_view: int = 1,
                    axis_name: Optional[str] = None,
                    view_valid: Optional[jnp.ndarray] = None,
                    out_dtype=None, packed_bilerp: bool = False,
                    splat_window: int = 48, splat_impl: str = "auto",
                    splat_mm_dtype: str = "bfloat16",
                    agg_remat: str = "full"):
    """One cascade scale.

    feat: (V, H_i, W_i, C) view features at scale ``scale_idx``;
    intrs: (V, 3, 3) finest-scale intrinsics; c2ws: (V, 4, 4).
    ``view_valid``: optional (V,) 0/1 mask for padded views when the view
    axis is sharded.

    Returns ``volume (dim, dim, dim, 2C)`` (mean ‖ var) and
    ``mask (dim, dim, dim)`` float.
    """
    V, H, W, C = feat.shape
    intrs_i = scale_intrinsics(intrs, scale_idx)
    out_dtype = out_dtype or feat.dtype
    valid = (jnp.ones((V,), feat.dtype) if view_valid is None
             else view_valid.astype(feat.dtype))

    # Every voxel is independent, so the grid is processed in contiguous
    # x-SLABS under a lax.scan: peak HBM is ONE slab's fp32 accumulators and
    # gather transients (~2M points) plus the bf16/fp32 output volume the
    # scan writes into — instead of full-volume (16.7M, C) fp32 sums,
    # per-view contributions, and mean/var intermediates all live at once
    # (measured ~6 GB fwd / ~10 GB fwd+bwd at 256³ x 5 views unslabbed;
    # HBM pressure, not FLOPs, is what made the reference-scale step slow
    # on a 16 GB chip).
    #
    # remat on the per-view contribution keeps autodiff residuals to the
    # already-live inputs: its outputs feed only additions (whose VJP needs
    # no primals); gathers, lerp weights, and the vm² square are recomputed
    # in the backward pass of each slab.
    r = jax.lax.optimization_barrier(
        jnp.linspace(-1.0, 1.0, dim, dtype=feat.dtype))
    slab = max(1, min(dim, (2 ** 21) // (dim * dim)))
    while dim % slab:
        slab -= 1
    n_slabs = dim // slab
    gy, gz = jnp.meshgrid(r, r, indexing="ij")  # (dim, dim)

    # Packed fast paths: 4 narrow gathers per (voxel, view) collapse to ONE
    # 9C-wide supercell gather. Two gradient routes:
    #   "diff"  — cotangents scatter into the RAW feature map
    #             (bilerp_packed_diff custom_jvp; pack conv in no backward);
    #   "table" — differentiate THROUGH the table: the scatter goes into the
    #             supercell rows (4x fewer scatter rows, 36-wide instead of
    #             4-wide — 9x better lane utilization) and the pack conv's
    #             transpose (a regular conv) carries table-cotangents into
    #             the image. The aggregation BACKWARD is 87% of the train
    #             step (TRAINBENCH_r02), and the scatter is what it pays for.
    # Pack once per scale OUTSIDE the slab scan (PERF.md: packs inside loop
    # bodies are not reliably hoisted on TPU).
    #   "table_bf16" — like "table", but the FORWARD (and the remat'd
    #             re-gather in the backward) reads a bf16 copy of the table
    #             (4.3x faster rows, GATHER_PROBE.json) while tangents and
    #             the backward scatter stay exactly the f32 path's
    #             (bilerp_supercell_mixed). Values carry bf16 table rounding.
    #   "pallas"  — bf16 forward like "table_bf16", but the backward is the
    #             Pallas SPLAT kernel (ops/pallas_splat.py): dense windowed
    #             matmuls into a VMEM image accumulator instead of the
    #             95.6M-row scatter that was 80% of the 256³ train step
    #             (MFU_r03.json). Requires dim % 16 == 0 (coarser scales
    #             fall back to "table_bf16") and cameras within
    #             ``splat_window`` (pallas_splat.required_window).
    mode = "diff" if packed_bilerp is True else packed_bilerp
    if mode == "pallas" and (dim % 16 != 0 or dim < 16):
        mode = "table_bf16"
    if mode == "pallas" and not isinstance(splat_window, (int, tuple)):
        raise ValueError(
            "packed_bilerp='pallas' needs a resolved splat_window (int or "
            f"(u, v)), got {splat_window!r} — the Runner resolves 'auto' "
            "from the dataset rig (Runner._auto_splat_windows); direct "
            "callers pass required_window(s_cascade) output")
    packed = (pack_supercell2d(feat)
              if mode in ("diff", "table", "table_bf16", "pallas") else None)
    packed_lo = (packed.table.astype(jnp.bfloat16)
                 if mode in ("table_bf16", "pallas") else None)
    if mode == "pallas":
        from gens_tpu.ops.pallas_splat import resolve_splat_impl

        # resolve "auto" HERE (plain-jit callers: the process default
        # backend); sharded callers resolve it against the MESH's platform
        # before building the step (parallel/sharded.py) so a CPU mesh in a
        # TPU-plugin process never traces the Mosaic kernel
        splat_impl = resolve_splat_impl(splat_impl)
        splat_mm = jnp.bfloat16 if splat_mm_dtype == "bfloat16" else jnp.float32

    def slab_body(carry, xs_r):
        pts = jnp.stack([
            jnp.broadcast_to(xs_r[:, None, None], (slab, dim, dim)),
            jnp.broadcast_to(gy[None], (slab, dim, dim)),
            jnp.broadcast_to(gz[None], (slab, dim, dim)),
        ], axis=-1).reshape(-1, 3)
        Ns = pts.shape[0]

        # remat policy: "full" recomputes the whole contribution in the
        # backward (minimum HBM — but the recompute re-runs the supercell
        # GATHERS, the addressing-bound op this whole module optimizes);
        # "save_gathers" keeps the gathered values as residuals
        # (checkpoint_name tag) so the backward recomputes only projection
        # math + elementwise; "save_gathers_proj" additionally saves the
        # projected pixel coords + in-frustum mask (xy f32 + mask: ~1 GB
        # extra residency at 256³x5 views) so the backward's projection
        # subgraph (per-voxel w2c/intrinsics matmuls + divides) DCEs away
        # entirely — the backward is then the splat kernel + elementwise
        # cotangent prep only
        if agg_remat == "save_gathers":
            remat = functools.partial(
                jax.checkpoint,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "agg_vals"))
        elif agg_remat == "save_gathers_proj":
            remat = functools.partial(
                jax.checkpoint,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "agg_vals", "agg_xy", "agg_mask"))
        else:
            remat = jax.checkpoint

        @remat
        def contribution(feat_v, table_v, table_lo_v, intr_v, c2w_v, valid_v):
            with jax.default_matmul_precision("highest"):
                w2c = jnp.linalg.inv(c2w_v)
                cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
                uvw = cam @ intr_v.T
            xy = uvw[:, :2] / (uvw[:, 2:] + 1e-8)
            xy = _checkpoint_name(xy, "agg_xy")
            # in-image test in normalized coords (volume.py:43): |norm| <= 1
            # and depth > 0 (slightly wider than a strict pixel-box test)
            nx = xy[:, 0] / ((W - 1) / 2.0) - 1.0
            ny = xy[:, 1] / ((H - 1) / 2.0) - 1.0
            mask = (jnp.abs(nx) <= 1) & (jnp.abs(ny) <= 1) & (cam[:, 2] > 0)
            mask = _checkpoint_name(mask.astype(feat.dtype) * valid_v,
                                    "agg_mask")
            if table_v is None:
                vals = bilerp(feat_v, xy)  # (Ns, C), zero outside
            elif mode == "table":
                vals = bilerp_supercell(table_v, packed.dims, xy)
            elif mode == "table_bf16":
                vals = bilerp_supercell_mixed(table_v, table_lo_v,
                                              packed.dims, xy)
            elif mode == "pallas":
                from gens_tpu.ops.pallas_splat import bilerp_agg_splat

                vals = bilerp_agg_splat(packed.dims, (slab, dim, dim),
                                        splat_window, splat_impl, splat_mm,
                                        feat_v, table_lo_v, xy, mask)
            else:
                vals = bilerp_packed_diff(feat_v, table_v, packed.dims, xy)
            vals = _checkpoint_name(vals, "agg_vals")
            vm = vals * mask[..., None]
            return vm, vm ** 2, mask

        warp_sum = jnp.zeros((Ns, C), jnp.float32)
        warp_sq_sum = jnp.zeros((Ns, C), jnp.float32)
        mask_sum = jnp.zeros((Ns,), jnp.float32)
        for v in range(V):
            vm, vm2, m = contribution(
                feat[v], None if packed is None else packed.table[v],
                None if packed_lo is None else packed_lo[v],
                intrs_i[v], c2ws[v], valid[v])
            warp_sum = warp_sum + vm.astype(jnp.float32)
            warp_sq_sum = warp_sq_sum + vm2.astype(jnp.float32)
            mask_sum = mask_sum + m.astype(jnp.float32)

        if axis_name is not None:
            warp_sum = jax.lax.psum(warp_sum, axis_name)
            warp_sq_sum = jax.lax.psum(warp_sq_sum, axis_name)
            mask_sum = jax.lax.psum(mask_sum, axis_name)

        denom = jnp.where(mask_sum <= 0, 1e-8, mask_sum)[..., None]
        mean = warp_sum / denom
        var = warp_sq_sum / denom - mean ** 2

        vol_slab = jnp.concatenate([mean, var], axis=-1).astype(
            out_dtype).reshape(slab, dim, dim, 2 * C)
        mask_slab = (mask_sum > min_vis_view).astype(
            jnp.float32).reshape(slab, dim, dim)
        return carry, (vol_slab, mask_slab)

    _, (vols, masks) = jax.lax.scan(slab_body, None, r.reshape(n_slabs, slab))
    volume = vols.reshape(dim, dim, dim, 2 * C)
    mask_volume = masks.reshape(dim, dim, dim)
    return volume, mask_volume


class AdaptiveAgg(_nn.Module):
    """Learned softmax-weighted cross-view aggregation (the reference's
    ``agg_adaptive``, volume.py:65-114).

    The reference scores each view's warped feature with ``self.agg_mlps[i]``
    — modules it never constructs (dead code, SURVEY.md §7.5); here the
    per-scale score MLPs exist (C -> d_hidden -> 1) and the path is a working
    alternative to mean/var aggregation (``config.volume.agg = "adaptive"``).
    Output volumes have C channels per scale (not 2C as mean‖var does).
    """

    n_scales: int
    d_hidden: int = 16

    @_nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], intrs: jnp.ndarray,
                 c2ws: jnp.ndarray, volume_dims: Sequence[int],
                 min_vis_view: int = 1):
        volumes, masks = [], []
        for i, dim in enumerate(volume_dims):
            feat = features[i]
            V, H, W, C = feat.shape
            intrs_i = scale_intrinsics(intrs, i)
            pts = voxel_grid(dim, feat.dtype)  # (dim³, 3)

            def project(feat_v, intr_v, c2w_v):
                with jax.default_matmul_precision("highest"):
                    w2c = jnp.linalg.inv(c2w_v)
                    cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
                    uvw = cam @ intr_v.T
                xy = uvw[:, :2] / (uvw[:, 2:] + 1e-8)
                nx = xy[:, 0] / ((W - 1) / 2.0) - 1.0
                ny = xy[:, 1] / ((H - 1) / 2.0) - 1.0
                mask = (jnp.abs(nx) <= 1) & (jnp.abs(ny) <= 1) & (cam[:, 2] > 0)
                return bilerp(feat_v, xy), mask

            feats, vmask = jax.vmap(project)(feat, intrs_i, c2ws)  # (V,N,C),(V,N)
            score = _nn.Dense(1, name=f"agg_mlp_{i}_out")(
                _nn.relu(_nn.Dense(self.d_hidden, name=f"agg_mlp_{i}_hidden")(feats))
            )  # (V, N, 1)
            score = jnp.where(vmask[..., None], score, -1e9)
            w = jax.nn.softmax(score, axis=0)
            vol = jnp.sum(feats * w, axis=0).reshape(dim, dim, dim, C)
            mask_volume = (vmask.sum(axis=0) > min_vis_view).astype(
                jnp.float32).reshape(dim, dim, dim)
            volumes.append(vol)
            masks.append(mask_volume)
        return volumes, masks


def agg_mean_var(features: Sequence[jnp.ndarray], intrs: jnp.ndarray,
                 c2ws: jnp.ndarray, volume_dims: Sequence[int],
                 min_vis_view: int = 1, axis_name: Optional[str] = None,
                 view_valid: Optional[jnp.ndarray] = None,
                 out_dtype=None, packed_bilerp: bool = False,
                 splat_window: int = 48, splat_impl: str = "auto",
                 splat_mm_dtype: str = "bfloat16", agg_remat: str = "full"
                 ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Build the full cascade. ``features[i]``: (V, H_i, W_i, C) fine-to-coarse.

    Returns (volumes, mask_volumes): ``volumes[i]`` is
    ``(dim_i, dim_i, dim_i, 2C)``, ``mask_volumes[i]`` is ``(dim_i,)*3``.
    """
    volumes, masks = [], []
    for i, dim in enumerate(volume_dims):
        # splat_window: a LIST is per-scale (the required window grows with
        # the voxel pitch, i.e. for coarser scales — sizing every scale to
        # the coarsest bound would 4x the finest scale's matmul FLOPs);
        # an int or (u, v) tuple applies to all scales
        sw = (splat_window[i] if isinstance(splat_window, list)
              else splat_window)
        vol, m = aggregate_scale(
            features[i], intrs, c2ws, dim, i,
            min_vis_view=min_vis_view, axis_name=axis_name,
            view_valid=view_valid, out_dtype=out_dtype,
            packed_bilerp=packed_bilerp, splat_window=sw,
            splat_impl=splat_impl, splat_mm_dtype=splat_mm_dtype,
            agg_remat=agg_remat,
        )
        volumes.append(vol)
        masks.append(m)
    return volumes, masks
