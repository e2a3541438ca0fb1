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
