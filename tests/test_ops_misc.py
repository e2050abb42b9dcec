"""Tests: Pallas fused kernel, neural_ode wrapper, profiling utils."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from universal_differential_equations_tpu.models.neural_ode import NeuralODE, neural_ode
from universal_differential_equations_tpu.nn import MLP
from universal_differential_equations_tpu.ops import (
    fused_updet_rhs,
    make_pointwise_mlp_params,
    updet_rhs_xla,
)
from universal_differential_equations_tpu.utils import benchmark


def test_pallas_kernel_matches_xla_interpret():
    # interpreter mode runs everywhere (real-TPU check lives in the examples)
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (2048,), jnp.float32)
    taps = jnp.array([6.25, -12.5, 6.25], jnp.float32)
    mlp = make_pointwise_mlp_params(key, (1, 10, 20, 10, 1))
    ref = updet_rhs_xla(u, taps, jnp.float32(1.0), mlp)
    out = fused_updet_rhs(u, taps, jnp.float32(1.0), mlp, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pallas_kernel_periodic_wrap():
    # the stencil must wrap the global boundary, not the tile rows
    key = jax.random.PRNGKey(1)
    u = jax.random.uniform(key, (1024,), jnp.float32)
    taps = jnp.array([1.0, 0.0, 0.0], jnp.float32)  # pure left-neighbor pick
    mlp = [(jnp.zeros((1, 1), jnp.float32), jnp.zeros((1,), jnp.float32))]
    out = fused_updet_rhs(u, taps, jnp.float32(1.0), mlp, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.roll(np.asarray(u), 1),
                               rtol=1e-6)


def test_neural_ode_wrapper():
    net = MLP([2, 8, 2], activation="tanh")
    params = net.init(jax.random.PRNGKey(0))
    sol = neural_ode(net, params, jnp.array([1.0, -1.0]), (0.0, 1.0),
                     saveat=jnp.linspace(0, 1, 5))
    assert sol.ys.shape == (5, 2) and bool(sol.success)

    layer = NeuralODE(net, (0.0, 0.5))
    y1 = layer(params, jnp.array([1.0, -1.0]))
    assert y1.shape == (2,)
    # differentiable
    g = jax.grad(lambda p: layer(p, jnp.array([1.0, -1.0])).sum())(params)
    assert np.isfinite(jax.flatten_util.ravel_pytree(g)[0]).all()


def test_benchmark_utility():
    stats = benchmark(lambda x: jnp.sum(x * x), jnp.ones(128), repeats=3,
                      warmup=1)
    assert stats["median_s"] > 0 and np.isfinite(stats["compile_s"])
