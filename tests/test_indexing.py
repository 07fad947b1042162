"""One-hot incidence gather/scatter vs native index ops."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.ops import indexing


def test_gather_matches_indexing(rng):
    n, e = 37, 120
    idx = rng.integers(0, n, size=e)
    x = jnp.asarray(rng.normal(size=(n, 5)))
    inc = indexing.build_incidence(idx, n, jnp.float64)
    np.testing.assert_allclose(
        np.asarray(indexing.gather(inc, x)), np.asarray(x)[idx], atol=0
    )


def test_scatter_matches_segment_sum(rng):
    n, e = 37, 120
    idx = rng.integers(0, n, size=e)
    v = jnp.asarray(rng.normal(size=(e, 3, 3)))
    inc = indexing.build_incidence(idx, n, jnp.float64)
    ref = jax.ops.segment_sum(v, jnp.asarray(idx), num_segments=n)
    np.testing.assert_allclose(
        np.asarray(indexing.scatter_add(inc, v)), np.asarray(ref), atol=1e-12
    )


def test_incidence_is_exact_binary(rng):
    idx = rng.integers(0, 10, size=50)
    inc = np.asarray(indexing.build_incidence(idx, 10, jnp.float32))
    assert set(np.unique(inc)) <= {0.0, 1.0}
    np.testing.assert_array_equal(inc.sum(axis=1), np.ones(50))
    np.testing.assert_array_equal(inc.argmax(axis=1), idx)
