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


def test_pallas_gather_tier_matches_index_tier(monkeypatch, rng):
    """Full linearize through the Pallas index-kernel tier (interpret mode)
    == the native index tier."""
    import functools

    import jax
    import jax.numpy as jnp

    from slam_tpu.io import synthetic
    from slam_tpu.ops import pallas_gather
    from slam_tpu.solver.linearize import linearize
    from slam_tpu.solver.models import SE2Model
    from slam_tpu.solver.problem import (
        anchor_first_node,
        edge_set_from_graph,
    )

    graph, _ = synthetic.circle_se2(n=48, seed=4)
    graph = graph.add_random_outliers(5, seed=5)
    edges = edge_set_from_graph(graph, dtype=jnp.float64, incidence=False)
    free = anchor_first_node(graph.num_nodes, dtype=jnp.float64)
    poses0 = jnp.asarray(graph.poses)
    sw0 = jnp.ones((edges.num_edges,), jnp.float64)
    kw = dict(model=SE2Model, robust="dcs", dcs_phi=0.5, huber_delta=0.01,
              sc_prior_lambda=1.0)
    ref = linearize(poses0, sw0, edges, free, **kw)

    # Route the "non-CPU" tier selection to the interpreted kernels.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        pallas_gather, "gather_rows",
        functools.partial(pallas_gather.gather_rows.__wrapped__,
                          interpret=True),
    )
    monkeypatch.setattr(
        pallas_gather, "scatter_add_rows",
        functools.partial(pallas_gather.scatter_add_rows.__wrapped__,
                          interpret=True),
    )
    out = linearize(poses0, sw0, edges, free, **kw)
    for name in ("Hdiag", "Hoff", "g", "cost"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
            atol=1e-12, err_msg=name,
        )
