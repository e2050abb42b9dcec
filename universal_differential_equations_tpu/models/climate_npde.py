"""Climate 1-D neural-PDE model family (``Climate/NeuralPDE/npde.jl``).

Method-of-lines diffusion–advection column: upwind ∂z (D1) and diffusive ∂zz
(D2, κ=0.05) operators built with ghost-node boundary handling exactly as the
reference's ``getops`` (``npde.jl:17-46``), a spectral-radius estimate for the
stabilized stiff solvers' ``eigen_est`` hook (C3), the nonlinear flux truth
``Φ(u)=cos(sin(u³)+sin(cos(u²)))`` (``npde.jl:54-57``), and the neural flux
``D1·NN(u) + D2·u`` (``npde.jl:72-78``).

Operators are dense (30×30) matrices on purpose: at this size a dense matmul
is a single MXU pass and XLA fuses the NN into it — the reference's sparse
tridiagonal layout would be slower on TPU (SURVEY.md C15 "optional
dense-operator mode for parity" is the *primary* mode here).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import MLP

__all__ = ["getops", "get_u0", "true_rhs", "make_neural_rhs", "eigen_est"]


def getops(n_grid: int = 32, kappa: float = 0.05, dtype=jnp.float32):
    """Build (D1, D2) interior operators with ghost-node BCs
    (``npde.jl:17-46``).  Returns dense (N-2, N-2) matrices and the
    spectral-radius estimate of D2 (the reference's ``EIGEN_EST``)."""
    N = n_grid
    dz = 1.0 / (N - 1)
    n = N - 2  # interior points

    # D1: first-order upwind ∂z with ghost columns folded in.  Reference
    # detail: D1_B[1,1]=-1 touches the *ghost* column, which QQ zeroes, so
    # the first interior row keeps only its +1/dz diagonal entry — i.e. the
    # fold leaves the interior matrix unchanged (verified against
    # npde.jl:17-46; no special-casing of D1[0,0] is needed).
    D1 = np.diag(np.ones(n)) + np.diag(-np.ones(n - 1), -1)
    D1 = D1 / dz

    # D2: standard second difference; ghost entries D2_B[1,1]=D2_B[end,end]=1
    # are likewise zeroed by QQ, leaving homogeneous Dirichlet ghosts
    D2 = (
        np.diag(-2.0 * np.ones(n))
        + np.diag(np.ones(n - 1), -1)
        + np.diag(np.ones(n - 1), 1)
    )
    D2 = kappa / dz**2 * D2

    eig = float(np.max(np.abs(np.linalg.eigvals(D2))))
    return jnp.asarray(D1, dtype), jnp.asarray(D2, dtype), eig


def eigen_est(D2):
    """On-device power-iteration spectral-radius estimate (C3) for the
    ROCK solvers' ``eigen_est`` hook (``npde.jl:61``)."""
    def body(carry, _):
        v, _ = carry
        w = D2 @ v
        nrm = jnp.linalg.norm(w)
        return (w / jnp.maximum(nrm, 1e-30), nrm), None

    v0 = jnp.ones((D2.shape[0],), D2.dtype) / jnp.sqrt(D2.shape[0] * 1.0)
    (v, lam), _ = jax.lax.scan(body, (v0, jnp.asarray(0.0, D2.dtype)), None,
                               length=20)
    return lam


def get_u0(n_grid: int = 32, dtype=jnp.float32):
    """Gaussian bump initial condition on the interior grid (``npde.jl:49-52``)."""
    z = jnp.linspace(0.0, 1.0, n_grid, dtype=dtype)[1:-1]
    return jnp.exp(-200.0 * (z - 0.75) ** 2)


def true_rhs(t, u, ops):
    """Truth: nonlinear flux through the upwind operator (``npde.jl:54-57``)."""
    D1, D2 = ops
    phi = jnp.cos(jnp.sin(u**3) + jnp.sin(jnp.cos(u**2)))
    return D1 @ phi + D2 @ u


def make_neural_rhs(key, n: int = 30, hidden: int = 8, dtype=jnp.float32):
    """Neural flux model: ``du = D1·NN(u) + D2·u`` with NN 30→8→30 tanh
    (``npde.jl:72-78``).  Returns (rhs, params0, net); args = (params, D1, D2)."""
    net = MLP([n, hidden, n], activation="tanh", final_activation="tanh")
    params0 = net.init(key, dtype)

    def rhs(t, u, args):
        params, D1, D2 = args
        return D1 @ net.apply(params, u) + D2 @ u

    return rhs, params0, net
