"""Differentiable interpolation primitives (gather + lerp).

These replace the reference's entire native layer — the 723-line CUDA/C++
double-backward grid-sample extension
(/root/reference/models/modules/grid_sample_cuda/gridsample_cuda.cu) and the
pure-torch fallback (/root/reference/models/modules/projector.py:62-214).
Because interpolation is written as explicit gathers and linear weights,
JAX autodiff composes to arbitrary order automatically: the Eikonal /
smoothness losses (grad-of-grad of the SDF) need no custom kernels.

Conventions (TPU-idiomatic, channels-last):
  * images / feature maps: ``(H, W, C)`` or view-batched ``(V, H, W, C)``
  * volumes: ``(X, Y, Z, C)`` spanning ``[-1, 1]^3`` with an
    ``align_corners`` grid (voxel ``i`` sits at ``-1 + 2 i / (N - 1)``)
  * sample points: ``(..., 3)`` in normalized ``[-1, 1]`` xyz order —
    axis 0 of the volume is x. (The reference stores volumes with the same
    axis order and flips query points to zyx purely to satisfy
    ``F.grid_sample``'s reversed convention, projector.py:223; we index
    directly.)
  * out-of-range samples contribute zero ("zeros" padding).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool = True) -> jnp.ndarray:
    """Map [-1, 1] to continuous pixel index space."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def bilerp(image: jnp.ndarray, xy: jnp.ndarray, *, align_corners: bool = True,
           normalized: bool = False) -> jnp.ndarray:
    """Bilinear sample of ``image (H, W, C)`` at ``xy (N, 2)``.

    ``xy`` is (x, y) in pixel coordinates (or [-1,1] if ``normalized``).
    Out-of-bounds corners contribute zero. Returns ``(N, C)``.
    """
    H, W, C = image.shape
    x, y = xy[..., 0], xy[..., 1]
    if normalized:
        x = _unnormalize(x, W, align_corners)
        y = _unnormalize(y, H, align_corners)

    x0f = jnp.floor(jax.lax.stop_gradient(x))
    y0f = jnp.floor(jax.lax.stop_gradient(y))
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    wx1 = x - x0f
    wy1 = y - y0f
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    flat = image.reshape(H * W, C)

    def corner(ix, iy, wx, wy):
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        vals = jnp.take(flat, iyc * W + ixc, axis=0)
        w = (wx * wy) * valid.astype(image.dtype)
        return vals * w[..., None]

    out = (
        corner(x0, y0, wx0, wy0)
        + corner(x1, y0, wx1, wy0)
        + corner(x0, y1, wx0, wy1)
        + corner(x1, y1, wx1, wy1)
    )
    return out


def bilerp_nchw_grid(images: jnp.ndarray, xy: jnp.ndarray, **kw) -> jnp.ndarray:
    """View-batched bilerp: ``images (V, H, W, C)``, ``xy (V, N, 2)`` -> (V, N, C)."""
    return jax.vmap(lambda im, g: bilerp(im, g, **kw))(images, xy)


def trilerp(volume: jnp.ndarray, pts: jnp.ndarray, *, align_corners: bool = True) -> jnp.ndarray:
    """Trilinear sample of ``volume (X, Y, Z, C)`` at normalized ``pts (N, 3)``.

    Matches the reference CUDA path ``cug.grid_sample_3d(volume, zyx,
    padding_mode='zeros', align_corners=True)`` (projector.py:229) in xyz
    convention (see module docstring). Returns ``(N, C)``.
    """
    X, Y, Z, C = volume.shape
    x = _unnormalize(pts[..., 0], X, align_corners)
    y = _unnormalize(pts[..., 1], Y, align_corners)
    z = _unnormalize(pts[..., 2], Z, align_corners)

    x0f = jnp.floor(jax.lax.stop_gradient(x))
    y0f = jnp.floor(jax.lax.stop_gradient(y))
    z0f = jnp.floor(jax.lax.stop_gradient(z))
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    z0 = z0f.astype(jnp.int32)

    wx1 = x - x0f
    wy1 = y - y0f
    wz1 = z - z0f

    flat = volume.reshape(X * Y * Z, C)

    out = jnp.zeros(pts.shape[:-1] + (C,), dtype=volume.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ix, iy, iz = x0 + dx, y0 + dy, z0 + dz
                valid = (
                    (ix >= 0) & (ix < X) & (iy >= 0) & (iy < Y) & (iz >= 0) & (iz < Z)
                )
                ixc = jnp.clip(ix, 0, X - 1)
                iyc = jnp.clip(iy, 0, Y - 1)
                izc = jnp.clip(iz, 0, Z - 1)
                vals = jnp.take(flat, (ixc * Y + iyc) * Z + izc, axis=0)
                wx = wx1 if dx else (1.0 - wx1)
                wy = wy1 if dy else (1.0 - wy1)
                wz = wz1 if dz else (1.0 - wz1)
                w = (wx * wy * wz) * valid.astype(volume.dtype)
                out = out + vals * w[..., None]
    return out


def nearest3d(volume: jnp.ndarray, pts: jnp.ndarray, *, align_corners: bool = True) -> jnp.ndarray:
    """Nearest-neighbour sample of ``volume (X, Y, Z, C)`` at ``pts (N, 3)``.

    Used for mask-volume lookups (reference projector.py:231 with
    ``sample_mode='nearest'``). Out-of-bounds points return zero.
    Returns ``(N, C)``.
    """
    X, Y, Z, C = volume.shape
    x = _unnormalize(pts[..., 0], X, align_corners)
    y = _unnormalize(pts[..., 1], Y, align_corners)
    z = _unnormalize(pts[..., 2], Z, align_corners)
    ix = jnp.round(x).astype(jnp.int32)
    iy = jnp.round(y).astype(jnp.int32)
    iz = jnp.round(z).astype(jnp.int32)
    valid = (ix >= 0) & (ix < X) & (iy >= 0) & (iy < Y) & (iz >= 0) & (iz < Z)
    ixc = jnp.clip(ix, 0, X - 1)
    iyc = jnp.clip(iy, 0, Y - 1)
    izc = jnp.clip(iz, 0, Z - 1)
    flat = volume.reshape(X * Y * Z, C)
    vals = jnp.take(flat, (ixc * Y + iyc) * Z + izc, axis=0)
    return vals * valid.astype(volume.dtype)[..., None]


def lookup_volume_cascade(volumes: Sequence[jnp.ndarray], pts: jnp.ndarray) -> jnp.ndarray:
    """Trilerp every scale of the volume cascade at ``pts`` and concatenate.

    Equivalent of the reference's ``lookup_volume(pts, volumes,
    sample_mode='grad')`` (projector.py:217-245): 5 scales x C channels each.
    Returns ``(N, sum_i C_i)``.
    """
    return jnp.concatenate([trilerp(v, pts) for v in volumes], axis=-1)


def lookup_mask_cascade(mask_volumes: Sequence[jnp.ndarray], pts: jnp.ndarray) -> jnp.ndarray:
    """Nearest-sample every mask volume; a point is valid if ANY scale marks
    it visible (reference implicit_surface.py:174: ``.any(dim=-1)``).

    ``mask_volumes[i]``: ``(X, Y, Z)`` float/bool. Returns ``(N,)`` float mask.
    """
    vals = [nearest3d(m[..., None].astype(jnp.float32), pts)[..., 0] for m in mask_volumes]
    return (jnp.stack(vals, axis=-1) > 0).any(axis=-1).astype(jnp.float32)


def combine_mask_cascade(mask_volumes: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Pre-OR the mask cascade into ONE finest-resolution volume so render
    paths pay a single nearest gather instead of one per scale.

    Each coarse mask is nearest-upsampled (repeat) to the finest grid; the
    result sampled with ``nearest3d`` reproduces ``lookup_mask_cascade``
    up to half-voxel alignment at coarse-mask boundaries (the cascade
    resolutions are power-of-two nested). Returns ``(X0, Y0, Z0)`` float.
    """
    fine = mask_volumes[0].astype(jnp.float32)
    X = fine.shape[0]
    for m in mask_volumes[1:]:
        f = X // m.shape[0]
        up = jnp.repeat(jnp.repeat(jnp.repeat(
            m.astype(jnp.float32), f, 0), f, 1), f, 2)
        fine = jnp.maximum(fine, up)
    return fine


def lookup_mask(mask_any: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Single-volume mask lookup (see combine_mask_cascade)."""
    return (nearest3d(mask_any[..., None], pts)[..., 0] > 0).astype(
        jnp.float32)


def safe_norm(x: jnp.ndarray, axis=-1, keepdims: bool = False,
              eps: float = 1e-12) -> jnp.ndarray:
    """L2 norm with a NaN-free gradient at x == 0.

    ``jnp.linalg.norm`` differentiates to x/||x|| — NaN at exactly-zero
    vectors, which masked dense compute produces routinely (e.g. gradients
    zeroed outside the voxel mask). sqrt(sum(x²)+eps) keeps the value within
    eps and the gradient finite (0 at x=0).
    """
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def pack_supercell(volume: jnp.ndarray):
    """Pack a (X, Y, Z, C) volume into a supercell corner table for
    :func:`trilerp_supercell`.

    TPU gathers are addressing-bound: fetching 8 separate C-channel corner
    rows per point uses ~C/128 of each (8,128)-tiled HBM row. Packing every
    2x2x2-cell neighbourhood's 3^3 corners into ONE row of 27*C channels
    turns the 8 narrow gathers into 1 wide gather (measured ~4.5x faster at
    C=4; bench went 8.3k -> 11k+ rays/s). The volume is zero-padded by one
    voxel so grid_sample's zeros-padding semantics become literal table
    entries.

    Returns ``(table (Sx*Sy*Sz, 27*C), (X, Y, Z))`` with S = dim//2 + 1.
    Row channel layout: group (ox, oy, oz) in [0,3)^3 at
    ``((ox*3 + oy)*3 + oz) * C``.
    """
    X, Y, Z, C = volume.shape
    # corner k in [-1, X] lives at padded index k+1 in [0, X+1]; one extra
    # trailing voxel so the last supercell's 3-block stays in range
    vp = jnp.pad(volume, ((1, 2), (1, 2), (1, 2), (0, 0)))
    Sx, Sy, Sz = X // 2 + 1, Y // 2 + 1, Z // 2 + 1
    # Patch extraction as one-hot convolutions: 27 strided slices + concat
    # relayout horribly on TPU (~850 ms at 256³), and a single 3D patches
    # conv provokes a pathological 6D layout choice in big (training)
    # graphs (a 128x-padded 35 GB buffer — compile-time OOM). Instead: the
    # x-window becomes 3 stride-2 slices along the MAJOR axis (cheap row
    # selection) batching 3 well-trodden 2D patch convs over (y, z).
    # HIGHEST precision keeps the x1.0 selection exact.
    blocks = []
    for ox in range(3):
        sl = vp[ox:ox + 2 * Sx:2]  # (Sx, Y+3, Z+3, C)
        lhs = jnp.transpose(sl, (0, 3, 1, 2))  # (Sx, C, Y+3, Z+3)
        pat = jax.lax.conv_general_dilated_patches(
            lhs, filter_shape=(3, 3), window_strides=(2, 2),
            padding=[(0, 0)] * 2, precision=jax.lax.Precision.HIGHEST)
        pat = pat.reshape(Sx, C, 9, Sy, Sz)
        blocks.append(jnp.transpose(pat, (0, 3, 4, 2, 1)))  # (Sx,Sy,Sz,9,C)
    # group layout ((ox*3 + oy)*3 + oz) * C, ox-major
    table = jnp.stack(blocks, axis=3)  # (Sx, Sy, Sz, 3, 9, C)
    return table.reshape(Sx * Sy * Sz, 27 * C), (X, Y, Z)


def trilerp_supercell(table: jnp.ndarray, dims: Tuple[int, int, int],
                      pts: jnp.ndarray, *,
                      align_corners: bool = True) -> jnp.ndarray:
    """Trilinear sample via a supercell table from :func:`pack_supercell`.

    Numerically identical to :func:`trilerp` (same weights, same
    zeros-padding semantics — verified exactly in tests): one wide gather per
    point, then the 8-corner lerp expressed as a factorized contraction over
    the 3x3x3 block with per-axis weight vectors (no second gather).
    Returns ``(N, C)``.
    """
    X, Y, Z = dims
    C = table.shape[-1] // 27
    Sx, Sy, Sz = X // 2 + 1, Y // 2 + 1, Z // 2 + 1

    x = _unnormalize(pts[..., 0], X, align_corners)
    y = _unnormalize(pts[..., 1], Y, align_corners)
    z = _unnormalize(pts[..., 2], Z, align_corners)
    x0f = jnp.floor(jax.lax.stop_gradient(x))
    y0f = jnp.floor(jax.lax.stop_gradient(y))
    z0f = jnp.floor(jax.lax.stop_gradient(z))
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    z0 = z0f.astype(jnp.int32)
    wx1, wy1, wz1 = x - x0f, y - y0f, z - z0f

    # a cell in [-1, dim-1] has both its corners inside the padded table
    # (out-of-range corners read literal zeros); cells fully outside are
    # clamped and zeroed through the weight vectors
    ok = ((x0 >= -1) & (x0 <= X - 1) & (y0 >= -1) & (y0 <= Y - 1)
          & (z0 >= -1) & (z0 <= Z - 1))

    px = jnp.clip(x0 + 1, 0, X)  # padded corner base
    py = jnp.clip(y0 + 1, 0, Y)
    pz = jnp.clip(z0 + 1, 0, Z)
    sx, ox = px // 2, px % 2
    sy, oy = py // 2, py % 2
    sz, oz = pz // 2, pz % 2

    rows = jnp.take(table, (sx * Sy + sy) * Sz + sz, axis=0)  # (N, 27C)

    # weights stay in the points' dtype (f32) like trilerp's, so bf16 tables
    # still accumulate through f32 products
    dt = wx1.dtype
    okf = ok.astype(dt)

    def axis_weights(o, w1):
        # 3-vector u with u[o] = 1-w, u[o+1] = w (o in {0,1})
        iota = jnp.arange(3, dtype=jnp.int32)[None, :]
        sel0 = (iota == o[:, None]).astype(dt)
        sel1 = (iota == (o + 1)[:, None]).astype(dt)
        return sel0 * (1.0 - w1)[:, None] + sel1 * w1[:, None]  # (N, 3)

    ux = axis_weights(ox, wx1) * okf[:, None]
    uy = axis_weights(oy, wy1)
    uz = axis_weights(oz, wz1)

    # per-point 27-weight vector and group reduction expressed through
    # STATIC 0/1 matmuls — tiny-minor-dim einsums ((N,3,3,3,C) etc.)
    # relayout horribly on TPU, whereas (N,k)x(k,m) matmuls are MXU-clean:
    #   w27 = (ux@EX) * (uy@EY) * (uz@EZ)    broadcast each axis to 27 slots
    #   out_c = sum_k rows[:, kC+c] * w27[:, k]  ==  (rows * (w27@R)) @ S
    gx, gy, gz = np.meshgrid(np.arange(3), np.arange(3), np.arange(3),
                             indexing="ij")
    EX = jnp.asarray((np.arange(3)[:, None] == gx.reshape(-1)[None]), dt)
    EY = jnp.asarray((np.arange(3)[:, None] == gy.reshape(-1)[None]), dt)
    EZ = jnp.asarray((np.arange(3)[:, None] == gz.reshape(-1)[None]), dt)
    R = jnp.asarray(np.repeat(np.eye(27), C, axis=1), dt)  # (27, 27C)
    S = jnp.asarray(np.tile(np.eye(C), (27, 1)), dt)  # (27C, C)

    hi = jax.lax.Precision.HIGHEST
    w27 = (jnp.dot(ux, EX, precision=hi) * jnp.dot(uy, EY, precision=hi)
           * jnp.dot(uz, EZ, precision=hi))  # (N, 27)
    w108 = jnp.dot(w27, R, precision=hi)  # (N, 27C)
    prod = rows.astype(dt) * w108
    return jnp.dot(prod, S, precision=hi)  # (N, C)


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["table"], meta_fields=["dims"])
@dataclasses.dataclass(frozen=True)
class PackedVolume:
    """A supercell corner table plus the (static) original volume dims, so
    the packed representation can ride through jit/Scene pytrees."""

    table: jnp.ndarray
    dims: Tuple[int, int, int]


def pack_cascade_supercell(volumes: Sequence[jnp.ndarray],
                           dtype=None) -> List[PackedVolume]:
    """Pack every scale of a cascade for supercell lookups (done ONCE per
    scene — the pack is a stride-2 patch conv, ~40 ms at 256³; repacking
    inside every SDF call site would dwarf the gather savings)."""
    out = []
    for v in volumes:
        if dtype is not None:
            v = v.astype(dtype)
        t, d = pack_supercell(v)
        out.append(PackedVolume(t, d))
    return out


def lookup_volume_cascade_supercell(packed: Sequence[PackedVolume],
                                    pts: jnp.ndarray) -> jnp.ndarray:
    """Cascade trilerp through supercell tables (one wide gather per scale);
    numerically identical to ``lookup_volume_cascade``."""
    return jnp.concatenate(
        [trilerp_supercell(p.table, p.dims, pts) for p in packed], axis=-1)


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["table"], meta_fields=["dims"])
@dataclasses.dataclass(frozen=True)
class PackedImage:
    """View-batched 2D supercell corner table: ``table (V, Sh*Sw, 9C)`` plus
    static original image dims (H, W)."""

    table: jnp.ndarray
    dims: Tuple[int, int]


def pack_supercell2d(images: jnp.ndarray, dtype=None) -> PackedImage:
    """2D analog of :func:`pack_supercell` for view-batched feature maps.

    images (V, H, W, C) -> PackedImage with one (9C)-channel row per 2x2
    pixel supercell, zero-padded by one pixel so bilerp's zeros-padding
    semantics are literal. One wide gather then replaces bilerp's 4 narrow
    corner gathers (the same TPU addressing-bound argument as the 3D case).

    ``dtype`` (e.g. bfloat16) stores the table narrow; the weighted combine
    in :func:`bilerp_supercell` upcasts to the query dtype, same contract
    as the 3D ``pack_cascade_supercell(dtype=...)``.
    """
    V, H, W, C = images.shape
    ip = jnp.pad(images, ((0, 0), (1, 2), (1, 2), (0, 0)))
    lhs = jnp.transpose(ip, (0, 3, 1, 2))  # (V, C, H+3, W+3)
    pat = jax.lax.conv_general_dilated_patches(
        lhs, filter_shape=(3, 3), window_strides=(2, 2),
        padding=[(0, 0)] * 2, precision=jax.lax.Precision.HIGHEST)
    Sh, Sw = H // 2 + 1, W // 2 + 1
    pat = pat.reshape(V, C, 9, Sh, Sw)
    table = jnp.transpose(pat, (0, 3, 4, 2, 1))  # (V, Sh, Sw, 9, C)
    table = table.reshape(V, Sh * Sw, 9 * C)
    if dtype is not None:
        table = table.astype(dtype)
    return PackedImage(table, (H, W))


def bilerp_supercell(table: jnp.ndarray, dims: Tuple[int, int],
                     xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample via one view's supercell table (pixel coords,
    align_corners semantics identical to :func:`bilerp`).

    table (Sh*Sw, 9C); xy (N, 2). Returns (N, C).
    """
    H, W = dims
    C = table.shape[-1] // 9
    Sh, Sw = H // 2 + 1, W // 2 + 1

    x, y = xy[..., 0], xy[..., 1]
    x0f = jnp.floor(jax.lax.stop_gradient(x))
    y0f = jnp.floor(jax.lax.stop_gradient(y))
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    wx1 = x - x0f
    wy1 = y - y0f

    ok = (x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1)
    px = jnp.clip(x0 + 1, 0, W)
    py = jnp.clip(y0 + 1, 0, H)
    sx, ox = px // 2, px % 2
    sy, oy = py // 2, py % 2

    rows = jnp.take(table, sy * Sw + sx, axis=0)  # (N, 9C)

    dt = wx1.dtype
    iota = jnp.arange(3, dtype=jnp.int32)[None, :]

    def axis_weights(o, w1):
        sel0 = (iota == o[:, None]).astype(dt)
        sel1 = (iota == (o + 1)[:, None]).astype(dt)
        return sel0 * (1.0 - w1)[:, None] + sel1 * w1[:, None]  # (N, 3)

    uy = axis_weights(oy, wy1) * ok.astype(dt)[:, None]
    ux = axis_weights(ox, wx1)

    # group g = oy*3 + ox (patch window flattened spatial-major, H first)
    g = np.arange(9)
    EY = jnp.asarray((np.arange(3)[:, None] == (g // 3)[None]), dt)
    EX = jnp.asarray((np.arange(3)[:, None] == (g % 3)[None]), dt)
    R = jnp.asarray(np.repeat(np.eye(9), C, axis=1), dt)  # (9, 9C)
    S = jnp.asarray(np.tile(np.eye(C), (9, 1)), dt)  # (9C, C)

    hi = jax.lax.Precision.HIGHEST
    w9 = (jnp.dot(uy, EY, precision=hi) * jnp.dot(ux, EX, precision=hi))
    w9c = jnp.dot(w9, R, precision=hi)  # (N, 9C)
    return jnp.dot(rows.astype(dt) * w9c, S, precision=hi)  # (N, C)


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["table"],
                   meta_fields=["dims", "offsets", "channels", "rgb_scale"])
@dataclasses.dataclass(frozen=True)
class FusedImagePyramid:
    """Every feature scale's 2D supercell table (and optionally the RGB
    image's, padded to the same width) stacked per view into one gather
    buffer — the 2D analog of :class:`FusedCascade` (one gather for the whole
    source-view warp instead of one per scale + one for RGB).

    table: (V, sum_i Sh_i*Sw_i [+ Sh_0*Sw_0], 9*C);
    dims[i] / offsets[i]: per-section image dims and row offsets. Section
    order: scales fine-to-coarse, then (optionally) RGB. channels[i]: the
    section's true channel count (RGB rows are zero-padded 27 -> 9C).
    rgb_scale: index of the scale whose dims the RGB section shares (0), or
    -1 when no RGB section.
    """

    table: jnp.ndarray
    dims: Tuple[Tuple[int, int], ...]
    offsets: Tuple[int, ...]
    channels: Tuple[int, ...]
    rgb_scale: int


def pack_image_pyramid_fused(features: Sequence[jnp.ndarray],
                             imgs: Optional[jnp.ndarray] = None,
                             dtype=None) -> FusedImagePyramid:
    """Pack per-view feature pyramids (+ RGB) for
    :func:`~gens_tpu.ops.projection.lookup_feature_fused`."""
    C = features[0].shape[-1]
    assert all(f.shape[-1] == C for f in features)
    tables, dims, offsets, channels = [], [], [], []
    off = 0
    for f in features:
        p = pack_supercell2d(f, dtype=dtype)
        tables.append(p.table)
        dims.append(p.dims)
        offsets.append(off)
        channels.append(C)
        off += p.table.shape[1]
    rgb_scale = -1
    if imgs is not None:
        Ci = imgs.shape[-1]
        assert Ci <= C, (Ci, C)
        p = pack_supercell2d(imgs, dtype=dtype)
        assert p.dims == dims[0], (p.dims, dims[0])
        # rows are (group, channel)-interleaved: pad each 9-group's channel
        # block from Ci to C so the C-grouped weight contraction stays valid
        V, S, _ = p.table.shape
        t = p.table.reshape(V, S, 9, Ci)
        t = jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, C - Ci))).reshape(
            V, S, 9 * C)
        tables.append(t)
        dims.append(p.dims)
        offsets.append(off)
        channels.append(imgs.shape[-1])
        rgb_scale = 0
        off += t.shape[1]
    return FusedImagePyramid(jnp.concatenate(tables, axis=1), tuple(dims),
                             tuple(offsets), tuple(channels), rgb_scale)


def bilerp_fused_rows(rows: jnp.ndarray, dims: Tuple[int, int],
                      xy: jnp.ndarray, channels: int) -> jnp.ndarray:
    """Weight contraction of pre-gathered 9C supercell rows for queries
    ``xy`` (the gather half of :func:`bilerp_supercell`, amortized by the
    caller's fused gather). Returns (N, channels)."""
    C = rows.shape[-1] // 9
    idx, (ox, oy), (wx1, wy1), ok = _sc_prepare2(dims, xy)
    dt = wx1.dtype
    uy = _axis_u(oy, wy1, dt) * ok.astype(dt)[:, None]
    ux = _axis_u(ox, wx1, dt)
    return _sc_contract2(rows, ux, uy, C)[:, :channels]


# -- differentiable packed lookups (training fast path) ----------------------
#
# The supercell tables above are built by a patch-extraction convolution whose
# BACKWARD provokes a pathological XLA layout on TPU (a 128x-padded 35 GB
# buffer — see PERF.md). So round 1 used packed tables only on gradient-free
# paths and trained through the raw 8-narrow-gather trilerp. The functions
# below close that gap (the VERDICT r1 item): a jax.custom_jvp chain
#
#   value  -> spatial gradient -> spatial Hessian -> (third derivative)
#
# where every PRIMAL reads the packed table (one wide gather), the
# volume-tangent path is the plain raw-gather trilerp applied to the TANGENT
# volume (whose reverse-mode transpose is a direct scatter into the raw
# volume layout — the pack conv never appears in any backward), and the
# point-tangent path reads the next-order derivative from the same packed
# rows. Training needs derivatives up to (2nd in pts) x (1st in volume) —
# Eikonal and the smoothness Hessian·1 term differentiated w.r.t. params —
# which this chain covers exactly; the third-spatial-derivative tensor at the
# end is computed from the (stop-gradient) table only, dropping 4th-order
# mixed terms no loss ever uses.


def _sc_prepare3(dims: Tuple[int, int, int], pts: jnp.ndarray):
    """Shared supercell addressing: row index, per-axis corner parity and
    fractional weights, validity. Matches :func:`trilerp_supercell`."""
    X, Y, Z = dims
    Sx, Sy, Sz = X // 2 + 1, Y // 2 + 1, Z // 2 + 1
    x = _unnormalize(pts[..., 0], X)
    y = _unnormalize(pts[..., 1], Y)
    z = _unnormalize(pts[..., 2], Z)
    x0f = jnp.floor(jax.lax.stop_gradient(x))
    y0f = jnp.floor(jax.lax.stop_gradient(y))
    z0f = jnp.floor(jax.lax.stop_gradient(z))
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    z0 = z0f.astype(jnp.int32)
    wx1, wy1, wz1 = x - x0f, y - y0f, z - z0f
    ok = ((x0 >= -1) & (x0 <= X - 1) & (y0 >= -1) & (y0 <= Y - 1)
          & (z0 >= -1) & (z0 <= Z - 1))
    px = jnp.clip(x0 + 1, 0, X)
    py = jnp.clip(y0 + 1, 0, Y)
    pz = jnp.clip(z0 + 1, 0, Z)
    sx, ox = px // 2, px % 2
    sy, oy = py // 2, py % 2
    sz, oz = pz // 2, pz % 2
    idx = (sx * Sy + sy) * Sz + sz
    return idx, (ox, oy, oz), (wx1, wy1, wz1), ok


def _axis_u(o, w1, dt):
    """Value weight 3-vector u with u[o] = 1-w, u[o+1] = w."""
    iota = jnp.arange(3, dtype=jnp.int32)[None, :]
    sel0 = (iota == o[:, None]).astype(dt)
    sel1 = (iota == (o + 1)[:, None]).astype(dt)
    return sel0 * (1.0 - w1)[:, None] + sel1 * w1[:, None]


def _axis_du(o, dt):
    """d/d(unnormalized coord) of :func:`_axis_u`: -1 at slot o, +1 at o+1."""
    iota = jnp.arange(3, dtype=jnp.int32)[None, :]
    sel0 = (iota == o[:, None]).astype(dt)
    sel1 = (iota == (o + 1)[:, None]).astype(dt)
    return sel1 - sel0


def _sc_contract3(rows: jnp.ndarray, ux, uy, uz, C: int) -> jnp.ndarray:
    """Factorized 3x3x3 contraction via static 0/1 matmuls (MXU-clean; tiny
    minor-dim einsums relayout horribly — see trilerp_supercell)."""
    dt = ux.dtype
    gx, gy, gz = np.meshgrid(np.arange(3), np.arange(3), np.arange(3),
                             indexing="ij")
    EX = jnp.asarray((np.arange(3)[:, None] == gx.reshape(-1)[None]), dt)
    EY = jnp.asarray((np.arange(3)[:, None] == gy.reshape(-1)[None]), dt)
    EZ = jnp.asarray((np.arange(3)[:, None] == gz.reshape(-1)[None]), dt)
    R = jnp.asarray(np.repeat(np.eye(27), C, axis=1), dt)
    S = jnp.asarray(np.tile(np.eye(C), (27, 1)), dt)
    hi = jax.lax.Precision.HIGHEST
    w27 = (jnp.dot(ux, EX, precision=hi) * jnp.dot(uy, EY, precision=hi)
           * jnp.dot(uz, EZ, precision=hi))
    w = jnp.dot(w27, R, precision=hi)
    return jnp.dot(rows.astype(dt) * w, S, precision=hi)


def supercell_grad(table: jnp.ndarray, dims: Tuple[int, int, int],
                   pts: jnp.ndarray) -> jnp.ndarray:
    """Spatial gradient of the trilinear interpolant from the packed table:
    d trilerp(volume, pts) / d pts, shape ``(N, C, 3)`` (normalized-coord
    units, matching ``jax.grad`` of :func:`trilerp`)."""
    X, Y, Z = dims
    C = table.shape[-1] // 27
    idx, (ox, oy, oz), (wx1, wy1, wz1), ok = _sc_prepare3(dims, pts)
    rows = jnp.take(table, idx, axis=0)
    dt = wx1.dtype
    okf = ok.astype(dt)
    ux, uy, uz = _axis_u(ox, wx1, dt), _axis_u(oy, wy1, dt), _axis_u(oz, wz1, dt)
    dux, duy, duz = _axis_du(ox, dt), _axis_du(oy, dt), _axis_du(oz, dt)
    gx = _sc_contract3(rows, dux, uy, uz, C) * (0.5 * (X - 1))
    gy = _sc_contract3(rows, ux, duy, uz, C) * (0.5 * (Y - 1))
    gz = _sc_contract3(rows, ux, uy, duz, C) * (0.5 * (Z - 1))
    return jnp.stack([gx, gy, gz], axis=-1) * okf[:, None, None]


def supercell_hess(table: jnp.ndarray, dims: Tuple[int, int, int],
                   pts: jnp.ndarray) -> jnp.ndarray:
    """Spatial Hessian of the trilinear interpolant from the packed table,
    ``(N, C, 3, 3)``. Within a cell the pure second derivatives vanish; only
    the three mixed terms are nonzero (symmetric)."""
    X, Y, Z = dims
    C = table.shape[-1] // 27
    idx, (ox, oy, oz), (wx1, wy1, wz1), ok = _sc_prepare3(dims, pts)
    rows = jnp.take(table, idx, axis=0)
    dt = wx1.dtype
    okf = ok.astype(dt)
    ux, uy, uz = _axis_u(ox, wx1, dt), _axis_u(oy, wy1, dt), _axis_u(oz, wz1, dt)
    dux, duy, duz = _axis_du(ox, dt), _axis_du(oy, dt), _axis_du(oz, dt)
    sx, sy, sz = 0.5 * (X - 1), 0.5 * (Y - 1), 0.5 * (Z - 1)
    hxy = _sc_contract3(rows, dux, duy, uz, C) * (sx * sy)
    hxz = _sc_contract3(rows, dux, uy, duz, C) * (sx * sz)
    hyz = _sc_contract3(rows, ux, duy, duz, C) * (sy * sz)
    zero = jnp.zeros_like(hxy)
    H = jnp.stack([
        jnp.stack([zero, hxy, hxz], axis=-1),
        jnp.stack([hxy, zero, hyz], axis=-1),
        jnp.stack([hxz, hyz, zero], axis=-1),
    ], axis=-2)  # (N, C, 3, 3)
    return H * okf[:, None, None, None]


def supercell_third(table: jnp.ndarray, dims: Tuple[int, int, int],
                    pts: jnp.ndarray) -> jnp.ndarray:
    """Third spatial derivative tensor ``(N, C, 3, 3, 3)``: the only nonzero
    entries are the 6 permutations of (x, y, z), all equal to the cell's
    d³/dxdydz value (piecewise constant)."""
    X, Y, Z = dims
    C = table.shape[-1] // 27
    idx, (ox, oy, oz), (wx1, wy1, wz1), ok = _sc_prepare3(dims, pts)
    rows = jnp.take(table, idx, axis=0)
    dt = wx1.dtype
    okf = ok.astype(dt)
    dux, duy, duz = _axis_du(ox, dt), _axis_du(oy, dt), _axis_du(oz, dt)
    s = 0.125 * (X - 1) * (Y - 1) * (Z - 1)
    t3 = _sc_contract3(rows, dux, duy, duz, C) * s * okf[:, None]  # (N, C)
    perm = np.zeros((3, 3, 3), np.float32)
    for i, j, k in ((0, 1, 2), (0, 2, 1), (1, 0, 2),
                    (1, 2, 0), (2, 0, 1), (2, 1, 0)):
        perm[i, j, k] = 1.0
    return t3[..., None, None, None] * jnp.asarray(perm, dt)


def _corner_vals3(volume: jnp.ndarray, pts: jnp.ndarray):
    """Eight masked corner values + fractional weights for the raw trilerp;
    linear in ``volume`` (the gather transposes to 8 scatters). Shared by the
    raw derivative helpers so value/grad/Hessian reuse ONE set of gathers."""
    X, Y, Z, C = volume.shape
    x = _unnormalize(pts[..., 0], X)
    y = _unnormalize(pts[..., 1], Y)
    z = _unnormalize(pts[..., 2], Z)
    x0f = jnp.floor(jax.lax.stop_gradient(x))
    y0f = jnp.floor(jax.lax.stop_gradient(y))
    z0f = jnp.floor(jax.lax.stop_gradient(z))
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    z0 = z0f.astype(jnp.int32)
    flat = volume.reshape(X * Y * Z, C)
    vals = {}
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ix, iy, iz = x0 + dx, y0 + dy, z0 + dz
                valid = ((ix >= 0) & (ix < X) & (iy >= 0) & (iy < Y)
                         & (iz >= 0) & (iz < Z))
                ixc = jnp.clip(ix, 0, X - 1)
                iyc = jnp.clip(iy, 0, Y - 1)
                izc = jnp.clip(iz, 0, Z - 1)
                v = jnp.take(flat, (ixc * Y + iyc) * Z + izc, axis=0)
                vals[(dx, dy, dz)] = v * valid.astype(volume.dtype)[:, None]
    w1 = (x - x0f, y - y0f, z - z0f)
    scales = (0.5 * (X - 1), 0.5 * (Y - 1), 0.5 * (Z - 1))
    return vals, w1, scales


def _raw_deriv3(volume: jnp.ndarray, pts: jnp.ndarray, diff_axes):
    """Derivative of trilerp w.r.t. the normalized axes in ``diff_axes``
    (a set), from raw corner gathers. () -> value, {0} -> d/dx, ..."""
    vals, w1, scales = _corner_vals3(volume, pts)
    out = 0.0
    for (dx, dy, dz), v in vals.items():
        w = None
        for axis, d in enumerate((dx, dy, dz)):
            if axis in diff_axes:
                f = jnp.full_like(w1[axis], scales[axis])
                f = f if d else -f
            else:
                f = w1[axis] if d else (1.0 - w1[axis])
            w = f if w is None else w * f
        out = out + v * w[:, None]
    return out


def trilerp_spatial_grad(volume: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Raw-gather spatial gradient ``(N, C, 3)``; linear in ``volume``."""
    return jnp.stack([_raw_deriv3(volume, pts, {a}) for a in range(3)],
                     axis=-1)


def trilerp_spatial_hess(volume: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Raw-gather spatial Hessian ``(N, C, 3, 3)``; linear in ``volume``."""
    hxy = _raw_deriv3(volume, pts, {0, 1})
    hxz = _raw_deriv3(volume, pts, {0, 2})
    hyz = _raw_deriv3(volume, pts, {1, 2})
    zero = jnp.zeros_like(hxy)
    return jnp.stack([
        jnp.stack([zero, hxy, hxz], axis=-1),
        jnp.stack([hxy, zero, hyz], axis=-1),
        jnp.stack([hxz, hyz, zero], axis=-1),
    ], axis=-2)


def _nonzero_tan(t) -> bool:
    from jax.custom_derivatives import SymbolicZero

    return not isinstance(t, SymbolicZero)


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def _pd_hess(dims, volume, table, pts):
    return supercell_hess(table, dims, pts)


def _pd_hess_jvp(dims, primals, tangents):
    volume, table, pts = primals
    dvol, _dtable, dpts = tangents
    out = supercell_hess(table, dims, pts)
    tan = None
    if _nonzero_tan(dvol):
        tan = trilerp_spatial_hess(dvol, pts)
    if _nonzero_tan(dpts):
        # third derivative from the (stop-gradient) table: its own
        # volume-dependence would only matter at 4th order
        t3 = supercell_third(table, dims, pts)
        t = jnp.einsum("ncijk,nk->ncij", t3, dpts)
        tan = t if tan is None else tan + t
    return out, tan if tan is not None else jnp.zeros_like(out)


_pd_hess.defjvp(_pd_hess_jvp, symbolic_zeros=True)


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def _pd_grad(dims, volume, table, pts):
    return supercell_grad(table, dims, pts)


def _pd_grad_jvp(dims, primals, tangents):
    volume, table, pts = primals
    dvol, _dtable, dpts = tangents
    out = supercell_grad(table, dims, pts)
    tan = None
    if _nonzero_tan(dvol):
        tan = trilerp_spatial_grad(dvol, pts)
    if _nonzero_tan(dpts):
        h = _pd_hess(dims, volume, table, pts)
        t = jnp.einsum("ncij,nj->nci", h, dpts)
        tan = t if tan is None else tan + t
    return out, tan if tan is not None else jnp.zeros_like(out)


_pd_grad.defjvp(_pd_grad_jvp, symbolic_zeros=True)


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def _pd_value(dims, volume, table, pts):
    return trilerp_supercell(table, dims, pts)


def _pd_value_jvp(dims, primals, tangents):
    volume, table, pts = primals
    dvol, _dtable, dpts = tangents
    out = trilerp_supercell(table, dims, pts)
    tan = None
    if _nonzero_tan(dvol):
        tan = trilerp(dvol, pts)
    if _nonzero_tan(dpts):
        g = _pd_grad(dims, volume, table, pts)
        t = jnp.einsum("ncd,nd->nc", g, dpts)
        tan = t if tan is None else tan + t
    return out, tan if tan is not None else jnp.zeros_like(out)


_pd_value.defjvp(_pd_value_jvp, symbolic_zeros=True)


def trilerp_packed_diff(volume: jnp.ndarray, packed: PackedVolume,
                        pts: jnp.ndarray) -> jnp.ndarray:
    """Trilerp whose forward reads the packed supercell table (one wide
    gather) but whose volume-cotangent scatters directly into the RAW volume
    layout — the pack convolution appears in no backward pass. Derivatives
    match :func:`trilerp` through (2nd order in pts) x (1st in volume),
    everything training uses."""
    return _pd_value(packed.dims, volume,
                     jax.lax.stop_gradient(packed.table), pts)


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["volumes", "packed"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class DiffPackedCascade:
    """A volume cascade carried as (raw volumes, packed tables) so training
    lookups can read the packed tables while gradients target the raw
    layout. Drop-in ``volumes`` argument for ``SDFNetwork``."""

    volumes: Any
    packed: Any


def lookup_volume_cascade_packed_diff(cascade: DiffPackedCascade,
                                      pts: jnp.ndarray) -> jnp.ndarray:
    """Cascade lookup through :func:`trilerp_packed_diff` per scale."""
    return jnp.concatenate(
        [trilerp_packed_diff(v, p, pts)
         for v, p in zip(cascade.volumes, cascade.packed)], axis=-1)


# -- 2D analog (source-view feature warps) -----------------------------------


def _sc_prepare2(dims: Tuple[int, int], xy: jnp.ndarray):
    H, W = dims
    Sw = W // 2 + 1
    x, y = xy[..., 0], xy[..., 1]
    x0f = jnp.floor(jax.lax.stop_gradient(x))
    y0f = jnp.floor(jax.lax.stop_gradient(y))
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    wx1, wy1 = x - x0f, y - y0f
    ok = (x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1)
    px = jnp.clip(x0 + 1, 0, W)
    py = jnp.clip(y0 + 1, 0, H)
    sx, ox = px // 2, px % 2
    sy, oy = py // 2, py % 2
    return sy * Sw + sx, (ox, oy), (wx1, wy1), ok


def _sc_contract2(rows: jnp.ndarray, ux, uy, C: int) -> jnp.ndarray:
    dt = ux.dtype
    g = np.arange(9)
    EY = jnp.asarray((np.arange(3)[:, None] == (g // 3)[None]), dt)
    EX = jnp.asarray((np.arange(3)[:, None] == (g % 3)[None]), dt)
    R = jnp.asarray(np.repeat(np.eye(9), C, axis=1), dt)
    S = jnp.asarray(np.tile(np.eye(C), (9, 1)), dt)
    hi = jax.lax.Precision.HIGHEST
    w9 = jnp.dot(uy, EY, precision=hi) * jnp.dot(ux, EX, precision=hi)
    return jnp.dot(rows.astype(dt) * jnp.dot(w9, R, precision=hi), S,
                   precision=hi)


def supercell2d_grad(table: jnp.ndarray, dims: Tuple[int, int],
                     xy: jnp.ndarray) -> jnp.ndarray:
    """Spatial gradient of the bilinear interpolant from the packed 2D table,
    ``(N, C, 2)`` in pixel-coordinate units (bilerp takes pixel coords)."""
    C = table.shape[-1] // 9
    idx, (ox, oy), (wx1, wy1), ok = _sc_prepare2(dims, xy)
    rows = jnp.take(table, idx, axis=0)
    dt = wx1.dtype
    okf = ok.astype(dt)
    ux, uy = _axis_u(ox, wx1, dt), _axis_u(oy, wy1, dt)
    dux, duy = _axis_du(ox, dt), _axis_du(oy, dt)
    gx = _sc_contract2(rows, dux, uy, C)
    gy = _sc_contract2(rows, ux, duy, C)
    return jnp.stack([gx, gy], axis=-1) * okf[:, None, None]


def supercell2d_hess(table: jnp.ndarray, dims: Tuple[int, int],
                     xy: jnp.ndarray) -> jnp.ndarray:
    """Spatial Hessian ``(N, C, 2, 2)``: only the mixed xy term is nonzero."""
    C = table.shape[-1] // 9
    idx, (ox, oy), (wx1, wy1), ok = _sc_prepare2(dims, xy)
    rows = jnp.take(table, idx, axis=0)
    dt = wx1.dtype
    okf = ok.astype(dt)
    dux, duy = _axis_du(ox, dt), _axis_du(oy, dt)
    hxy = _sc_contract2(rows, dux, duy, C) * okf[:, None]
    zero = jnp.zeros_like(hxy)
    return jnp.stack([jnp.stack([zero, hxy], axis=-1),
                      jnp.stack([hxy, zero], axis=-1)], axis=-2)


def _corner_vals2(image: jnp.ndarray, xy: jnp.ndarray):
    H, W, C = image.shape
    x, y = xy[..., 0], xy[..., 1]
    x0f = jnp.floor(jax.lax.stop_gradient(x))
    y0f = jnp.floor(jax.lax.stop_gradient(y))
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    flat = image.reshape(H * W, C)
    vals = {}
    for dx in (0, 1):
        for dy in (0, 1):
            ix, iy = x0 + dx, y0 + dy
            valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            ixc = jnp.clip(ix, 0, W - 1)
            iyc = jnp.clip(iy, 0, H - 1)
            v = jnp.take(flat, iyc * W + ixc, axis=0)
            vals[(dx, dy)] = v * valid.astype(image.dtype)[:, None]
    return vals, (x - x0f, y - y0f)


def bilerp_spatial_grad(image: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Raw-gather spatial gradient of bilerp, ``(N, C, 2)``; linear in
    ``image``."""
    vals, (wx1, wy1) = _corner_vals2(image, xy)
    gx = 0.0
    gy = 0.0
    for (dx, dy), v in vals.items():
        sx = 1.0 if dx else -1.0
        sy = 1.0 if dy else -1.0
        wy = wy1 if dy else (1.0 - wy1)
        wx = wx1 if dx else (1.0 - wx1)
        gx = gx + v * (sx * wy)[:, None]
        gy = gy + v * (sy * wx)[:, None]
    return jnp.stack([gx, gy], axis=-1)


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def _pd2_grad(dims, image, table, xy):
    return supercell2d_grad(table, dims, xy)


def _pd2_grad_jvp(dims, primals, tangents):
    image, table, xy = primals
    dimg, _dtable, dxy = tangents
    out = supercell2d_grad(table, dims, xy)
    tan = None
    if _nonzero_tan(dimg):
        tan = bilerp_spatial_grad(dimg, xy)
    if _nonzero_tan(dxy):
        h = supercell2d_hess(table, dims, xy)
        t = jnp.einsum("ncij,nj->nci", h, dxy)
        tan = t if tan is None else tan + t
    return out, tan if tan is not None else jnp.zeros_like(out)


_pd2_grad.defjvp(_pd2_grad_jvp, symbolic_zeros=True)


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def _pd2_value(dims, image, table, xy):
    return bilerp_supercell(table, dims, xy)


def _pd2_value_jvp(dims, primals, tangents):
    image, table, xy = primals
    dimg, _dtable, dxy = tangents
    out = bilerp_supercell(table, dims, xy)
    tan = None
    if _nonzero_tan(dimg):
        tan = bilerp(dimg, xy)
    if _nonzero_tan(dxy):
        g = _pd2_grad(dims, image, table, xy)
        t = jnp.einsum("ncd,nd->nc", g, dxy)
        tan = t if tan is None else tan + t
    return out, tan if tan is not None else jnp.zeros_like(out)


_pd2_value.defjvp(_pd2_value_jvp, symbolic_zeros=True)


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def _bs2_mixed(dims, table, table_lo, xy):
    return bilerp_supercell(table_lo, dims, xy)


def _bs2_mixed_jvp(dims, primals, tangents):
    table, table_lo, xy = primals
    dtable, _dlo, dxy = tangents
    out = bilerp_supercell(table_lo, dims, xy)
    tan = None
    if _nonzero_tan(dtable):
        # tangent (and hence the reverse-mode scatter) targets the FULL-
        # PRECISION table — gradients are bit-identical to the f32 path
        tan = bilerp_supercell(dtable, dims, xy)
    if _nonzero_tan(dxy):
        g = supercell2d_grad(table_lo, dims, xy)
        t = jnp.einsum("ncd,nd->nc", g, dxy)
        tan = t if tan is None else tan + t
    return out, tan if tan is not None else jnp.zeros_like(out)


_bs2_mixed.defjvp(_bs2_mixed_jvp, symbolic_zeros=True)


def bilerp_supercell_mixed(table: jnp.ndarray, table_lo: jnp.ndarray,
                           dims: Tuple[int, int],
                           xy: jnp.ndarray) -> jnp.ndarray:
    """Bilerp whose FORWARD gathers the low-precision (bf16) supercell table
    — 4.3x faster per row on TPU (GATHER_PROBE.json) — while every
    derivative targets the full-precision ``table`` (tangents read it,
    cotangents scatter into it in f32). Values carry bf16 rounding of the
    table entries; gradients are exactly the f32 path's.

    Training-aggregation fast path (``volume.packed_bilerp="table_bf16"``):
    the aggregation forward was 424 ms of the 2316 ms agg fwd+bwd at 256³
    (MFU_r03.json), all f32 gather rows; the remat'd backward re-gathers
    them again, so the bf16 rows pay off twice.
    """
    return _bs2_mixed(dims, table, jax.lax.stop_gradient(table_lo), xy)


def bilerp_packed_diff(image: jnp.ndarray, table: jnp.ndarray,
                       dims: Tuple[int, int], xy: jnp.ndarray) -> jnp.ndarray:
    """Bilerp whose forward reads the packed 2D table but whose
    image-cotangent scatters directly into the raw image layout (2D analog
    of :func:`trilerp_packed_diff`). ``xy`` in pixel coordinates."""
    return _pd2_value(dims, image, jax.lax.stop_gradient(table), xy)


# -- fused supercell cascade (one gather for all scales + mask) --------------
#
# Round-3 probe data (scripts/gather_probe*.py, GATHER_PROBE.md): TPU gather
# throughput improves sharply with population size (bf16 108-ch rows: ~40
# rows/us at 131k rows vs ~313 rows/us at 4M), so the render core's many
# SEPARATE per-scale/per-mask gathers of ~131k rows each waste most of their
# time on per-op ramp-up. The fused cascade concatenates every scale's
# supercell table (all rows are 27C wide) plus a 27-channel-padded mask table
# into ONE buffer, so a cascade lookup (and optionally the nearest-neighbour
# mask probe) is ONE gather of (n_scales [+1]) * N rows instead of 6 ops.
# Numerically identical to trilerp_supercell per scale / nearest3d for the
# mask (same rows, same f32 weight contractions).


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["table"],
                   meta_fields=["dims", "offsets", "mask_offset"])
@dataclasses.dataclass(frozen=True)
class FusedCascade:
    """All cascade scales' supercell tables (and optionally the combined
    finest-resolution mask volume) stacked into one gather buffer.

    table: (sum_i Sx_i*Sy_i*Sz_i [+ Sx_0*Sy_0*Sz_0], 27*C);
    dims[i]: original (X, Y, Z) of scale i; offsets[i]: row offset of scale
    i's section; mask_offset: row offset of the mask section (addressed with
    scale-0 supercell indices), or None.
    """

    table: jnp.ndarray
    dims: Tuple[Tuple[int, int, int], ...]
    offsets: Tuple[int, ...]
    mask_offset: Optional[int]


def pack_cascade_fused(volumes: Sequence[jnp.ndarray],
                       mask_any: Optional[jnp.ndarray] = None,
                       dtype=None) -> FusedCascade:
    """Pack a same-channel cascade (and optionally the pre-OR'd finest mask
    volume from :func:`combine_mask_cascade`) for :func:`lookup_cascade_fused`.

    ``mask_any`` must have scale-0's spatial dims. Like the per-scale packs
    this is done ONCE per scene.
    """
    C = volumes[0].shape[-1]
    assert all(v.shape[-1] == C for v in volumes)
    tables, dims, offsets = [], [], []
    off = 0
    for v in volumes:
        if dtype is not None:
            v = v.astype(dtype)
        t, d = pack_supercell(v)
        tables.append(t)
        dims.append(d)
        offsets.append(off)
        off += t.shape[0]
    mask_offset = None
    if mask_any is not None:
        assert mask_any.shape == dims[0], (mask_any.shape, dims[0])
        mt, md = pack_supercell(
            mask_any[..., None].astype(tables[0].dtype))  # (S0, 27)
        mt = jnp.pad(mt, ((0, 0), (0, 27 * C - 27)))
        tables.append(mt)
        mask_offset = off
        off += mt.shape[0]
    return FusedCascade(jnp.concatenate(tables, axis=0), tuple(dims),
                        tuple(offsets), mask_offset)


def _axis_delta(d, dt):
    """One-hot 3-vector at slot ``d`` (0..2) — the nearest-corner selector."""
    iota = jnp.arange(3, dtype=jnp.int32)[None, :]
    return (iota == d[:, None]).astype(dt)


def lookup_cascade_fused(fc: FusedCascade, pts: jnp.ndarray,
                         with_mask: bool = False):
    """Cascade trilerp (+ optional nearest-neighbour mask) through ONE gather.

    Returns ``feats (N, n_scales*C)`` and, if ``with_mask``, also
    ``mask (N,)`` float 0/1 — numerically identical to
    ``lookup_volume_cascade_supercell`` + ``nearest3d`` on the mask volume.
    """
    C = fc.table.shape[-1] // 27
    dt = pts.dtype
    idx_all = []
    contract_args = []
    for dims_i, off in zip(fc.dims, fc.offsets):
        idx, (ox, oy, oz), (wx1, wy1, wz1), ok = _sc_prepare3(dims_i, pts)
        idx_all.append(off + idx)
        ux = _axis_u(ox, wx1, dt) * ok.astype(dt)[:, None]
        uy = _axis_u(oy, wy1, dt)
        uz = _axis_u(oz, wz1, dt)
        contract_args.append((ux, uy, uz))

    if with_mask:
        assert fc.mask_offset is not None
        X, Y, Z = fc.dims[0]
        idx0, (ox, oy, oz), _, ok0 = _sc_prepare3(fc.dims[0], pts)
        # nearest-corner offsets within the 3^3 block: round() in padded
        # index space relative to the block base (matches nearest3d's
        # jnp.round semantics exactly, including round-half-to-even)
        x = _unnormalize(pts[..., 0], X)
        y = _unnormalize(pts[..., 1], Y)
        z = _unnormalize(pts[..., 2], Z)
        x0 = jnp.floor(jax.lax.stop_gradient(x)).astype(jnp.int32)
        y0 = jnp.floor(jax.lax.stop_gradient(y)).astype(jnp.int32)
        z0 = jnp.floor(jax.lax.stop_gradient(z)).astype(jnp.int32)
        rx = jnp.round(jax.lax.stop_gradient(x)).astype(jnp.int32) - x0
        ry = jnp.round(jax.lax.stop_gradient(y)).astype(jnp.int32) - y0
        rz = jnp.round(jax.lax.stop_gradient(z)).astype(jnp.int32) - z0
        dx = _axis_delta(ox + rx, dt) * ok0.astype(dt)[:, None]
        dy = _axis_delta(oy + ry, dt)
        dz = _axis_delta(oz + rz, dt)
        idx_all.append(fc.mask_offset + idx0)

    K = len(idx_all)
    N = pts.shape[0]
    idx = jnp.stack(idx_all, axis=0).reshape(-1)
    rows = jnp.take(fc.table, idx, axis=0).reshape(K, N, 27 * C)  # ONE gather

    feats = jnp.concatenate(
        [_sc_contract3(rows[i], ux, uy, uz, C)
         for i, (ux, uy, uz) in enumerate(contract_args)], axis=-1)
    if not with_mask:
        return feats
    mask = _sc_contract3(rows[len(fc.dims), :, :27], dx, dy, dz, 1)[:, 0]
    return feats, (jax.lax.stop_gradient(mask) > 0).astype(jnp.float32)


def pack_cascade(volumes: Sequence[jnp.ndarray]):
    """Flatten a same-channel volume cascade into one (ΣN_i, C) buffer +
    static (shapes, offsets) metadata for ``lookup_volume_cascade_packed``."""
    C = volumes[0].shape[-1]
    assert all(v.shape[-1] == C for v in volumes)
    shapes = tuple(v.shape[:3] for v in volumes)
    offsets = []
    off = 0
    for s in shapes:
        offsets.append(off)
        off += s[0] * s[1] * s[2]
    flat = jnp.concatenate([v.reshape(-1, C) for v in volumes], axis=0)
    return flat, shapes, tuple(offsets)


def lookup_volume_cascade_packed(flat: jnp.ndarray, shapes, offsets,
                                 pts: jnp.ndarray) -> jnp.ndarray:
    """Fused cascade trilerp: ALL scales' corner reads go through ONE gather
    into the packed buffer (5 scales x 8 corners = 40 takes collapse to 1 —
    and their transpose to 1 scatter in the backward). Numerically identical
    to ``lookup_volume_cascade``; TPU gathers amortize much better at one
    large index vector.
    """
    N = pts.shape[0]
    idx_all = []
    w_all = []
    for (X, Y, Z), off in zip(shapes, offsets):
        x = _unnormalize(pts[..., 0], X)
        y = _unnormalize(pts[..., 1], Y)
        z = _unnormalize(pts[..., 2], Z)
        x0f = jnp.floor(jax.lax.stop_gradient(x))
        y0f = jnp.floor(jax.lax.stop_gradient(y))
        z0f = jnp.floor(jax.lax.stop_gradient(z))
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        z0 = z0f.astype(jnp.int32)
        wx1, wy1, wz1 = x - x0f, y - y0f, z - z0f
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    ix, iy, iz = x0 + dx, y0 + dy, z0 + dz
                    valid = ((ix >= 0) & (ix < X) & (iy >= 0) & (iy < Y)
                             & (iz >= 0) & (iz < Z))
                    ixc = jnp.clip(ix, 0, X - 1)
                    iyc = jnp.clip(iy, 0, Y - 1)
                    izc = jnp.clip(iz, 0, Z - 1)
                    idx_all.append(off + (ixc * Y + iyc) * Z + izc)
                    wx = wx1 if dx else (1.0 - wx1)
                    wy = wy1 if dy else (1.0 - wy1)
                    wz = wz1 if dz else (1.0 - wz1)
                    w_all.append((wx * wy * wz) * valid.astype(flat.dtype))

    idx = jnp.stack(idx_all).reshape(-1)              # (S*8*N,)
    w = jnp.stack(w_all)                              # (S*8, N)
    vals = jnp.take(flat, idx, axis=0)                # ONE gather
    vals = vals.reshape(len(shapes), 8, N, flat.shape[-1])
    out = jnp.sum(vals * w.reshape(len(shapes), 8, N, 1), axis=1)  # (S, N, C)
    return jnp.moveaxis(out, 0, 1).reshape(N, -1)     # (N, S*C)
