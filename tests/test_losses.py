"""Loss tests: LNCC analytic properties and aggregation semantics."""

import jax.numpy as jnp
import numpy as np

from gens_tpu.config import LossConfig
from gens_tpu.losses import compute_lncc


def test_lncc_perfect_correlation(rng):
    """NCC is invariant to affine intensity changes: src = a*ref + b gives
    cc = 1 -> ncc = 0."""
    N, P2, C, S = 6, 25, 2, 3
    ref = rng.rand(N, P2, C).astype(np.float32)
    srcs = np.stack([2.0 * ref + 0.3, 0.5 * ref - 0.1, -1.5 * ref + 1.0])
    ncc = np.asarray(compute_lncc(jnp.asarray(ref), jnp.asarray(srcs)))
    assert ncc.shape == (N, 1)
    np.testing.assert_allclose(ncc, 0.0, atol=1e-3)


def test_lncc_uncorrelated_near_one(rng):
    N, P2, C, S = 4, 121, 1, 2
    ref = rng.rand(N, P2, C).astype(np.float32)
    srcs = rng.rand(S, N, P2, C).astype(np.float32)
    ncc = np.asarray(compute_lncc(jnp.asarray(ref), jnp.asarray(srcs)))
    assert (ncc > 0.5).all()


def test_lncc_best_two_selection(rng):
    """With one perfectly-correlated src among noise, best-2 averaging must
    cut the score roughly in half vs all-noise."""
    N, P2, C = 5, 49, 1
    ref = rng.rand(N, P2, C).astype(np.float32)
    good = ref.copy()[None]
    noise = rng.rand(2, N, P2, C).astype(np.float32)
    srcs = np.concatenate([good, noise], axis=0)
    ncc_mixed = np.asarray(compute_lncc(jnp.asarray(ref), jnp.asarray(srcs)))
    ncc_noise = np.asarray(compute_lncc(jnp.asarray(ref), jnp.asarray(noise)))
    assert (ncc_mixed < ncc_noise - 0.1).all()
