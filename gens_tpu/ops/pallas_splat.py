"""Pallas TPU kernel: bilinear SPLAT — the adjoint of warping a regular
voxel grid into an image — as dense windowed matmuls instead of a scatter.

Why this exists (the round-3 flagship kernel): the volume aggregation
samples every voxel of the cascade in every view (95.6M bilinear queries at
256³ x 5 views) and its BACKWARD therefore scatters 95.6M cotangent rows.
XLA scatter-add runs at ~65 rows/µs on v5e regardless of dtype/width
(GATHER_PROBE.json) — an ~1.5 s analytic floor that was 80% of the measured
2.86 s train step (MFU_r03.json). The reference hit the same wall on GPU and
answered with a hand CUDA kernel
(/root/reference/models/modules/grid_sample_cuda/gridsample_cuda.cu:214);
this is the TPU-native answer.

The structure the scatter ignores: queries are PROJECTIONS OF A REGULAR
GRID. A (16, 16) tile of voxels in one x-slab projects into a small window
of the image (span <= 16·J pixels for view Jacobian J px/voxel — ~2 at the
reference scale, since image and volume resolutions track each other across
the cascade). Within that window the adjoint is DENSE:

    dimg[p, q] += sum_n hat(v_n - p) · hat(u_n - q) · ct_n

i.e. per tile: two 256-row hat-weight matrices built on the fly in VMEM
(exact bilinear: hat(t) = max(0, 1-|t|), masked to in-image columns — the
zeros-padding adjoint), one (window·C x 256) @ (256 x window) MXU matmul,
and one windowed accumulate into a VMEM-resident image accumulator. No
scatter anywhere; the whole dL/dimage lives in VMEM until one final write.

Exactness: bit-for-bit the adjoint of `bilerp` (hat weights are the same
wx/wy products; out-of-image corners contribute zero). Verified against
`jax.grad` of the plain path in tests/test_pallas_splat.py (interpret mode
on CPU, compiled on TPU).

Safety: correctness requires every IN-IMAGE query of a tile to land inside
the tile's window. `required_window` computes the worst-case projected span
for a camera set on the host; callers must check it against `window`
(the synthetic rig and DTU-style rigs need < 44 at the reference scale;
out-of-image / behind-camera queries carry zero cotangent and clamp
harmlessly).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256  # queries per kernel step: one (1, 16, 16) voxel block
_TY = 16
_TZ = 16


def _splat_kernel(W: int, H: int, C: int, WBu: int, WBv: int, n_tiles: int,
                  mm_dtype, xy_ref, ct_ref, out_ref):
    t = pl.program_id(0)

    # out_ref's index map is constant, so the block stays VMEM-resident
    # across the whole grid and doubles as the accumulator (one HBM write
    # at the end) — no scratch copy, which matters at the finest scale
    # ((4, 480, 640) f32 is 4.9 MB of the ~16 MB VMEM).
    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xy = xy_ref[0]  # (TILE, 2)
    ct = ct_ref[0]  # (TILE, C)
    u = xy[:, 0]
    v = xy[:, 1]

    # window bases from the in-image-clipped positions (behind-camera /
    # far-out queries carry zero cotangent; clipping only positions the
    # window). Bases clamp into [0, dim - WB] so the dynamic-slice update
    # stays in range; hat weights vanish wherever the clamp displaced a
    # zero-cotangent query.
    uc = jnp.clip(u, -1.0, float(W))
    vc = jnp.clip(v, -1.0, float(H))
    bu = jnp.clip(jnp.floor(jnp.min(uc)).astype(jnp.int32), 0, W - WBu)
    bv = jnp.clip(jnp.floor(jnp.min(vc)).astype(jnp.int32), 0, H - WBv)

    # hat-weight matrices vs the window's absolute pixel columns/rows,
    # masked to the image interior — exactly bilerp's per-corner
    # (weight · in-image) products
    ju = jax.lax.broadcasted_iota(jnp.int32, (TILE, WBu), 1) + bu
    jv = jax.lax.broadcasted_iota(jnp.int32, (TILE, WBv), 1) + bv
    du = u[:, None] - ju.astype(jnp.float32)
    dv = v[:, None] - jv.astype(jnp.float32)
    Ub = jnp.maximum(0.0, 1.0 - jnp.abs(du)) * (ju < W)
    Vb = jnp.maximum(0.0, 1.0 - jnp.abs(dv)) * (jv < H)
    # (ju >= 0 / jv >= 0 are implied by the base clamp at 0)

    # A[n, k*WBv + j] = Vb[n, j] · ct[n, k]  (TILE, C*WBv)
    A = (Vb[:, None, :] * ct[:, :, None]).reshape(TILE, C * WBv)
    # mm_dtype=bf16 operands: 4x the f32 MXU rate; accumulation stays f32
    # (preferred_element_type). Hat weights/cotangents carry bf16 rounding
    # (~2^-8 relative) — same order as the bf16 forward the "pallas" mode
    # already runs. The masks/zero structure above are computed in f32, so
    # exact zeros stay exact; mm_dtype=f32 gives the bit-exact adjoint.
    win = jax.lax.dot_general(
        A.astype(mm_dtype), Ub.astype(mm_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (C*WBv, WBu)
    win = win.reshape(C, WBv, WBu)
    out_ref[:, pl.ds(bv, WBv), pl.ds(bu, WBu)] += win


def _window_uv(window, hw: Tuple[int, int]) -> Tuple[int, int]:
    """Per-axis window sizes, clamped to the image: a window covering the
    whole image along an axis is trivially sufficient, which is what the
    coarse cascade scales (image smaller than the bound) resolve to.
    Windows are PER-AXIS because the u-span bound can exceed H on wide
    images (then min(window, W, H) would silently under-cover u)."""
    H, W = hw
    wu, wv = (window, window) if isinstance(window, int) else window
    return min(int(wu), W), min(int(wv), H)


def splat_bilinear(xy: jnp.ndarray, ct: jnp.ndarray, hw: Tuple[int, int],
                   window=48, interpret: bool = False,
                   mm_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Dense-windowed bilinear splat: ``dimg[y, x, c] = Σ_n
    hat(v_n - y)·hat(u_n - x)·ct[n, c]`` with zeros-padding semantics.

    xy: (n_tiles, TILE, 2) pixel coords, tiled so each TILE block spans
    < ``window - 2`` pixels in each image axis (see ``tile_grid_queries``);
    window: int or (window_u, window_v); ct: (n_tiles, TILE, C);
    mm_dtype: hat-matmul operand dtype (bf16 = 4x MXU rate, f32 = the
    bit-exact adjoint). Returns (H, W, C) float32.
    """
    n_tiles = xy.shape[0]
    H, W = hw
    C = ct.shape[-1]
    WBu, WBv = _window_uv(window, hw)

    kernel = functools.partial(_splat_kernel, W, H, C, WBu, WBv, n_tiles,
                               mm_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, TILE, 2), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, C), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, H, W), lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.float32),
        interpret=interpret,
    )(xy.astype(jnp.float32), ct.astype(jnp.float32))
    return jnp.transpose(out, (1, 2, 0))  # (H, W, C)


def tile_grid_queries(x: jnp.ndarray, grid_shape: Tuple[int, int, int]):
    """Permute per-query rows laid out as a flattened (S, Y, Z) voxel grid
    into (n_tiles, TILE, ·) blocks of (1, 16, 16) voxels."""
    S, Y, Z = grid_shape
    assert Y % _TY == 0 and Z % _TZ == 0, grid_shape
    c = x.shape[-1]
    x = x.reshape(S, Y // _TY, _TY, Z // _TZ, _TZ, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, TILE, c)


def untile_grid_queries(x: jnp.ndarray, grid_shape: Tuple[int, int, int]):
    """Inverse of :func:`tile_grid_queries`."""
    S, Y, Z = grid_shape
    c = x.shape[-1]
    x = x.reshape(S, Y // _TY, Z // _TZ, _TY, _TZ, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(S * Y * Z, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def bilerp_agg_splat(dims, grid_shape, window, image, table_lo, xy):
    """Bilerp for the volume aggregation whose FORWARD gathers the packed
    (typically bf16) supercell table and whose BACKWARD is the Pallas splat
    kernel producing dL/d``image`` directly — no scatter, no pack-conv
    transpose in any backward.

    dims: (H, W) of ``image``; grid_shape: the (S, Y, Z) voxel-grid layout
    of the flattened queries ``xy``; window: static pixel window (must
    cover :func:`required_window` for the camera set).
    """
    from gens_tpu.ops.interp import bilerp_supercell

    return bilerp_supercell(table_lo, dims, xy)


def _bas_fwd(dims, grid_shape, window, image, table_lo, xy):
    from gens_tpu.ops.interp import bilerp_supercell

    return bilerp_supercell(table_lo, dims, xy), xy


def _bas_bwd(dims, grid_shape, window, xy, ct):
    interp = jax.default_backend() != "tpu"
    xy_t = tile_grid_queries(xy, grid_shape)
    ct_t = tile_grid_queries(ct, grid_shape)
    dimg = splat_bilinear(xy_t, ct_t, dims, window=window,
                          interpret=interp)
    return dimg, None, None


bilerp_agg_splat.defvjp(_bas_fwd, _bas_bwd)


def required_window(intrs: np.ndarray, c2ws: np.ndarray, dim: int,
                    hw: Tuple[int, int], margin: int = 3
                    ) -> Tuple[int, int]:
    """Worst-case projected pixel span (per image axis: u, v) of a (16, 16)
    voxel tile for this camera set — the minimum safe ``window``. Host-side
    (numpy), run once per scene/dataset.

    Conservative bound: max pixel step between ADJACENT voxel centers
    anywhere in the in-frustum unit cube, times the 16-voxel tile extent,
    plus the bilinear footprint margin. The bound is dominated by the
    voxels NEAREST a camera (projective magnification), so rigs that orbit
    close to the unit cube need large windows.
    """
    n = 33  # dense probe grid is enough for a smooth projective map
    r = np.linspace(-1, 1, n)
    gx, gy, gz = np.meshgrid(r, r, r, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    voxel = 2.0 / (dim - 1)
    worst = np.zeros(2)
    for intr, c2w in zip(intrs, c2ws):
        w2c = np.linalg.inv(c2w)
        cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
        uvw = cam @ intr.T
        z = uvw[:, 2:]
        valid = z[:, 0] > 0.05
        xy = uvw[:, :2] / np.where(np.abs(z) < 1e-8, 1e-8, z)
        in_img = (valid & (xy[:, 0] >= -1) & (xy[:, 0] <= hw[1])
                  & (xy[:, 1] >= -1) & (xy[:, 1] <= hw[0]))
        if not in_img.any():
            continue
        # numerical Jacobian via the probe-grid spacing
        xy3 = xy.reshape(n, n, n, 2)
        m3 = in_img.reshape(n, n, n)
        step = 2.0 / (n - 1)
        for ax in range(3):
            d = np.abs(np.diff(xy3, axis=ax)) / step * voxel
            m = (np.minimum(m3.take(range(n - 1), ax),
                            m3.take(range(1, n), ax))
                 .astype(bool))
            if m.any():
                worst = np.maximum(worst, d[m].max(axis=0))
    wu, wv = (np.ceil(worst * max(_TY, _TZ)).astype(int) + margin).tolist()
    return wu, wv


def required_windows_cascade(intrs: np.ndarray, c2ws: np.ndarray,
                             volume_dims, hw: Tuple[int, int],
                             margin: int = 3) -> list:
    """Per-scale ``required_window`` list for a whole cascade — pass the
    result as ``volume.splat_window`` (a LIST selects per-scale windows in
    ``agg_mean_var``). Scale ``i`` samples the (H>>i, W>>i) feature map
    with intrinsics scaled by 0.5**i (models/volume.py aggregate_scale)."""
    out = []
    for i, dim in enumerate(volume_dims):
        intr_i = np.asarray(intrs, np.float64).copy()
        intr_i[..., :2, :] *= 0.5 ** i
        hw_i = (max(hw[0] >> i, 1), max(hw[1] >> i, 1))
        out.append(required_window(intr_i, np.asarray(c2ws),
                                   max(int(dim), 2), hw_i, margin=margin))
    return out


