"""Unit tests for gather+lerp interpolation vs torch.grid_sample ground truth.

torch (CPU build) is available in the image; we use its grid_sample as the
behavioral oracle for the reference semantics (align_corners=True, zeros
padding), plus finite-difference checks to second order — the property the
reference needed 723 lines of CUDA for.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gens_tpu.ops.interp import (
    bilerp,
    trilerp,
    nearest3d,
    lookup_volume_cascade,
    lookup_mask_cascade,
)


def test_trilerp_matches_torch_grid_sample(rng):
    X, Y, Z, C = 7, 6, 5, 4
    vol = rng.randn(X, Y, Z, C).astype(np.float32)
    pts = rng.uniform(-1.3, 1.3, size=(200, 3)).astype(np.float32)

    ours = trilerp(jnp.asarray(vol), jnp.asarray(pts))

    # torch: volume (1, C, D, H, W) with D=x, H=y, W=z; grid (x->W) so flip
    # pts to zyx exactly as the reference does (projector.py:223).
    tvol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]
    tgrid = torch.from_numpy(pts[:, ::-1].copy())[None, None, None]  # (1,1,1,N,3)
    ref = F.grid_sample(tvol, tgrid, mode="bilinear", padding_mode="zeros",
                        align_corners=True)
    ref = ref[0, :, 0, 0].permute(1, 0).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_bilerp_matches_torch(rng):
    H, W, C = 9, 11, 3
    img = rng.randn(H, W, C).astype(np.float32)
    xy = rng.uniform(-1.2, 1.2, size=(150, 2)).astype(np.float32)

    ours = bilerp(jnp.asarray(img), jnp.asarray(xy), normalized=True)

    timg = torch.from_numpy(img).permute(2, 0, 1)[None]
    tgrid = torch.from_numpy(xy)[None, None]  # (1,1,N,2) x->W, y->H
    ref = F.grid_sample(timg, tgrid, mode="bilinear", padding_mode="zeros",
                        align_corners=True)[0, :, 0].permute(1, 0).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_bilerp_pixel_coords_identity(rng):
    H, W, C = 5, 6, 2
    img = rng.randn(H, W, C).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    xy = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
    out = bilerp(jnp.asarray(img), jnp.asarray(xy))
    np.testing.assert_allclose(np.asarray(out), img.reshape(-1, C), atol=1e-6)


def test_nearest3d_matches_torch(rng):
    X = Y = Z = 6
    vol = rng.rand(X, Y, Z, 1).astype(np.float32)
    # keep away from .5 rounding boundaries to dodge tie-breaking conventions
    pts = (rng.randint(0, X, size=(100, 3)).astype(np.float32) / (X - 1)) * 2 - 1
    pts += rng.uniform(-0.3, 0.3, size=pts.shape).astype(np.float32) * (2 / (X - 1)) * 0.4

    ours = nearest3d(jnp.asarray(vol), jnp.asarray(pts))

    tvol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]
    tgrid = torch.from_numpy(pts[:, ::-1].copy())[None, None, None]
    ref = F.grid_sample(tvol, tgrid, mode="nearest", padding_mode="zeros",
                        align_corners=True)[0, :, 0, 0].permute(1, 0).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_trilerp_grads_to_second_order(rng):
    # grad-of-grad w.r.t. the VOLUME through a nonlinear wrapper must match
    # finite differences — the property the reference needed a custom CUDA
    # double-backward kernel for (gridsample_cuda.cu).
    X = Y = Z = 4
    vol = jnp.asarray(rng.randn(X, Y, Z, 1).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.7, 0.7, size=(6, 3)).astype(np.float32))

    @jax.jit
    def loss(v, p):
        # nonlinear in both the sampled value and the point-gradient, so the
        # second-order path through trilerp is exercised
        g = jax.grad(lambda q: trilerp(v, q).sum())(p)
        return jnp.sum((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    analytic = jax.jit(jax.grad(loss))(vol, pts)  # d(eikonal)/d(volume)

    eps = 1e-3
    num = np.zeros_like(np.asarray(vol))
    base_shape = vol.shape
    flat = np.asarray(vol).ravel()
    for i in range(flat.size):
        vp, vm = flat.copy(), flat.copy()
        vp[i] += eps
        vm[i] -= eps
        num.ravel()[i] = (
            float(loss(jnp.asarray(vp.reshape(base_shape)), pts))
            - float(loss(jnp.asarray(vm.reshape(base_shape)), pts))
        ) / (2 * eps)
    np.testing.assert_allclose(np.asarray(analytic), num, rtol=5e-2, atol=5e-3)


def test_trilerp_grad_wrt_points_is_volume_slope():
    # A volume that is linear in x must have d(out)/dx == slope everywhere
    # inside, independent of y, z.
    N = 5
    xs = jnp.linspace(-1, 1, N)
    vol = jnp.broadcast_to(xs[:, None, None, None], (N, N, N, 1)) * 3.0
    pts = jnp.array([[0.1, -0.2, 0.4], [-0.5, 0.9, -0.9]], jnp.float32)
    g = jax.grad(lambda p: trilerp(vol, p).sum())(pts)
    np.testing.assert_allclose(np.asarray(g[:, 0]), 3.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g[:, 1:]), 0.0, atol=1e-5)


def test_cascade_lookup_shapes(rng):
    vols = [jnp.asarray(rng.randn(d, d, d, 4).astype(np.float32)) for d in (8, 4, 2)]
    masks = [jnp.asarray((rng.rand(d, d, d) > 0.5).astype(np.float32)) for d in (8, 4, 2)]
    pts = jnp.asarray(rng.uniform(-1, 1, size=(17, 3)).astype(np.float32))
    feats = lookup_volume_cascade(vols, pts)
    assert feats.shape == (17, 12)
    m = lookup_mask_cascade(masks, pts)
    assert m.shape == (17,)
    assert set(np.unique(np.asarray(m))).issubset({0.0, 1.0})


def test_zeros_padding_outside():
    vol = jnp.ones((4, 4, 4, 1), jnp.float32)
    far = jnp.array([[5.0, 5.0, 5.0], [-3.0, 0.0, 0.0]], jnp.float32)
    out = trilerp(vol, far)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
    out = nearest3d(vol, far)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


# -- supercell-packed trilerp (the TPU fast path) -----------------------------


def test_supercell_trilerp_matches_trilerp(rng):
    from gens_tpu.ops.interp import pack_supercell, trilerp_supercell

    for dims in [(8, 8, 8), (7, 6, 5), (16, 8, 4)]:
        vol = jnp.asarray(rng.randn(*dims, 4).astype(np.float32))
        table, d = pack_supercell(vol)
        pts = np.concatenate([
            rng.uniform(-1, 1, (200, 3)),
            rng.uniform(-1.3, 1.3, (100, 3)),
            np.array([[-1, -1, -1], [1, 1, 1], [0, 0, 0],
                      [1.0001, 0, 0], [-3, 0, 0], [0, 5, 0]]),
        ]).astype(np.float32)
        pts = jnp.asarray(pts)
        np.testing.assert_allclose(
            np.asarray(trilerp(vol, pts)),
            np.asarray(trilerp_supercell(table, d, pts)),
            atol=1e-5, rtol=1e-5)


def test_supercell_trilerp_grads_match(rng):
    from gens_tpu.ops.interp import pack_supercell, trilerp_supercell

    vol = jnp.asarray(rng.randn(8, 8, 8, 4).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-1.1, 1.1, (64, 3)).astype(np.float32))

    def fa(p):
        return jnp.sum(trilerp(vol, p) ** 2)

    def fb(p):
        return jnp.sum(trilerp_supercell(*pack_supercell(vol), p) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(fa)(pts)),
                               np.asarray(jax.grad(fb)(pts)),
                               atol=1e-4, rtol=1e-4)
    # second order (the Eikonal/smooth losses differentiate the gradient)
    ha = jax.grad(lambda p: jax.grad(fa)(p).sum())(pts)
    hb = jax.grad(lambda p: jax.grad(fb)(p).sum())(pts)
    np.testing.assert_allclose(np.asarray(ha), np.asarray(hb),
                               atol=1e-4, rtol=1e-4)
    # gradient w.r.t. the volume flows through the pack conv (finetune mode)
    va = jax.grad(lambda v: jnp.sum(trilerp(v, pts) ** 2))(vol)
    vb = jax.grad(lambda v: jnp.sum(
        trilerp_supercell(*pack_supercell(v), pts) ** 2))(vol)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                               atol=1e-4, rtol=1e-4)


def test_packed_volume_rides_pytrees(rng):
    from gens_tpu.ops.interp import (PackedVolume, pack_cascade_supercell,
                                     lookup_volume_cascade_supercell)

    vols = [jnp.asarray(rng.randn(d, d, d, 4).astype(np.float32))
            for d in (8, 4, 2)]
    packed = pack_cascade_supercell(vols)
    assert all(isinstance(p, PackedVolume) for p in packed)
    pts = jnp.asarray(rng.uniform(-1, 1, (17, 3)).astype(np.float32))

    # dims stay static through jit (meta field), table is traced
    @jax.jit
    def f(packed, pts):
        return lookup_volume_cascade_supercell(packed, pts)

    out = f(packed, pts)
    ref = lookup_volume_cascade(vols, pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_supercell_bilerp_matches_bilerp(rng):
    from gens_tpu.ops.interp import pack_supercell2d, bilerp_supercell

    for H, W, C in [(16, 16, 4), (15, 13, 3), (9, 24, 4)]:
        imgs = jnp.asarray(rng.randn(2, H, W, C).astype(np.float32))
        pk = pack_supercell2d(imgs)
        assert pk.table.shape == (2, (H // 2 + 1) * (W // 2 + 1), 9 * C)
        xy = np.concatenate([
            rng.uniform(-2, max(H, W) + 2, (300, 2)),
            np.array([[0, 0], [W - 1, H - 1], [-1, -1],
                      [W - 0.5, 0], [0.3, H - 1.0]]),
        ]).astype(np.float32)
        xy = jnp.asarray(xy)
        for v in range(2):
            np.testing.assert_allclose(
                np.asarray(bilerp(imgs[v], xy)),
                np.asarray(bilerp_supercell(pk.table[v], pk.dims, xy)),
                atol=1e-5, rtol=1e-5)


def test_supercell_bilerp_grads_match(rng):
    from gens_tpu.ops.interp import pack_supercell2d, bilerp_supercell

    H, W, C = 12, 10, 3
    imgs = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32))
    xy = jnp.asarray(rng.uniform(-1, max(H, W), (64, 2)).astype(np.float32))

    def fa(q):
        return jnp.sum(bilerp(imgs[0], q) ** 2)

    def fb(q):
        return jnp.sum(bilerp_supercell(
            pack_supercell2d(imgs).table[0], (H, W), q) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(fa)(xy)),
                               np.asarray(jax.grad(fb)(xy)),
                               atol=1e-4, rtol=1e-4)
    va = jax.grad(lambda im: jnp.sum(bilerp(im[0], xy) ** 2))(imgs)
    vb = jax.grad(lambda im: jnp.sum(bilerp_supercell(
        pack_supercell2d(im).table[0], (H, W), xy) ** 2))(imgs)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                               atol=1e-4, rtol=1e-4)


def test_supercell_bilerp_bf16_table_close(rng):
    """bf16-stored packed tables must track the f32 bilerp to bf16 epsilon
    (the combine upcasts; only the stored corner values are narrowed)."""
    import jax.numpy as jnp
    from gens_tpu.ops.interp import bilerp, bilerp_supercell, pack_supercell2d

    imgs = jnp.asarray(rng.rand(2, 33, 47, 6).astype(np.float32))
    pk = pack_supercell2d(imgs, dtype=jnp.bfloat16)
    assert pk.table.dtype == jnp.bfloat16
    xy = jnp.asarray(
        np.stack([rng.uniform(-2, 48, 500), rng.uniform(-2, 34, 500)],
                 -1).astype(np.float32))
    ref = bilerp(imgs[0], xy)
    got = bilerp_supercell(pk.table[0], pk.dims, xy)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
