"""Tests for inverse-CDF sampling and NeuS hierarchical up-sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from gens_tpu.ops.sampling import (
    SDF_SENTINEL,
    hierarchical_sample,
    merge_z_vals,
    sample_pdf,
)


def test_sample_pdf_uniform_weights():
    bins = jnp.linspace(0.0, 1.0, 9)[None].repeat(3, 0)  # (3, 9)
    weights = jnp.ones((3, 8))
    s = sample_pdf(bins, weights, 16)
    assert s.shape == (3, 16)
    # uniform weights -> roughly uniform deterministic samples
    np.testing.assert_allclose(np.asarray(s[0]),
                               np.linspace(1 / 32, 1 - 1 / 32, 16), atol=0.01)


def test_sample_pdf_concentrates_on_peak():
    bins = jnp.linspace(0.0, 1.0, 11)[None]  # (1, 11)
    weights = jnp.zeros((1, 10)).at[0, 5].set(1.0)
    s = np.asarray(sample_pdf(bins, weights, 8))
    assert (s >= 0.45).all() and (s <= 0.65).all()


def test_sample_pdf_monotone():
    key = jax.random.PRNGKey(0)
    bins = jnp.sort(jax.random.uniform(key, (4, 12)), axis=-1)
    weights = jax.random.uniform(jax.random.PRNGKey(1), (4, 11))
    s = np.asarray(sample_pdf(bins, weights, 20))
    assert (s >= np.asarray(bins[:, :1]) - 1e-6).all()
    assert (s <= np.asarray(bins[:, -1:]) + 1e-6).all()


def test_merge_z_vals_sorted():
    z = jnp.asarray([[0.1, 0.5, 0.9]])
    s = jnp.asarray([[1.0, 2.0, 3.0]])
    nz = jnp.asarray([[0.3, 0.7]])
    ns = jnp.asarray([[1.5, 2.5]])
    zm, sm = merge_z_vals(z, s, nz, ns)
    np.testing.assert_allclose(np.asarray(zm[0]), [0.1, 0.3, 0.5, 0.7, 0.9])
    np.testing.assert_allclose(np.asarray(sm[0]), [1.0, 1.5, 2.0, 2.5, 3.0])


def test_hierarchical_sample_concentrates_near_surface():
    # analytic sphere SDF, rays from outside through the center: importance
    # samples must cluster near the two surface crossings.
    radius = 0.5
    mask = jnp.ones((8, 8, 8))

    def sdf_fn(pts):
        return jnp.linalg.norm(pts, axis=-1) - radius

    rays_o = jnp.asarray([[0.0, -2.0, 0.0]] * 4)
    rays_d = jnp.asarray([[0.0, 1.0, 0.0]] * 4)
    near = jnp.full((4, 1), 1.0)
    far = jnp.full((4, 1), 3.0)

    z = hierarchical_sample(rays_o, rays_d, near, far, sdf_fn, mask,
                            n_samples=32, n_importance=32, up_sample_steps=4)
    assert z.shape == (4, 64)
    zs = np.asarray(z[0])
    assert np.all(np.diff(zs) >= -1e-6)  # sorted
    # crossings at t = 2 - 0.5 = 1.5 and 2 + 0.5 = 2.5
    near_surface = ((np.abs(zs - 1.5) < 0.15) | (np.abs(zs - 2.5) < 0.15)).mean()
    base_density = 0.3 / 2.0  # fraction of [1,3] within the bands
    assert near_surface > 2 * base_density, near_surface


def test_hierarchical_sample_respects_voxel_mask():
    # fully masked-out volume -> SDF treated as sentinel, sampling still
    # returns finite sorted values (no NaNs from empty weights)
    mask = jnp.zeros((4, 4, 4))

    def sdf_fn(pts):
        return jnp.linalg.norm(pts, axis=-1) - 0.5

    rays_o = jnp.asarray([[0.0, -2.0, 0.0]])
    rays_d = jnp.asarray([[0.0, 1.0, 0.0]])
    z = hierarchical_sample(rays_o, rays_d, jnp.full((1, 1), 1.0),
                            jnp.full((1, 1), 3.0), sdf_fn, mask,
                            n_samples=16, n_importance=16, up_sample_steps=2)
    assert np.isfinite(np.asarray(z)).all()
