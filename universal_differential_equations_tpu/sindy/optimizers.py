"""Sparse-regression optimizers: STLSQ, STRRidge, SR3 (SURVEY.md C19).

The reference sweeps large threshold grids — ``STLSQ(exp10.(-3:0.01:5))`` is
an 801-point sweep (``scenario_1.jl:162-164``), SR3 sweeps ``exp10.(-7:0.1:7)``
(``loop_recoveries.jl:100``).  TPU-native design: one threshold's fixed-point
iteration is a small static-shape loop of masked normal-equation solves, and
the whole grid runs as a single ``vmap`` — the entire sweep is one XLA
program, no host round-trips (SURVEY.md §3.4 hot loop).

Masked least squares uses the exact identity trick: rows/columns of inactive
coefficients are replaced by the identity block, so inactive entries are
*exactly* zero and the active block stays SPD — stable in f32 on TPU (no
big-penalty conditioning hacks).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["STLSQ", "STRRidge", "SR3", "masked_lstsq"]


def masked_lstsq(gram, corr, active, ridge=0.0):
    """Solve (Θᵀ W Θ) ξ = Θᵀ W y restricted to ``active`` coefficients.

    ``gram``: (m, m), ``corr``: (m,), ``active``: (m,) bool.  Inactive entries
    of the solution are exactly zero.
    """
    m = gram.shape[0]
    mask = active.astype(gram.dtype)
    A = gram * mask[:, None] * mask[None, :]
    A = A + jnp.diag(1.0 - mask) + ridge * jnp.diag(mask)
    b = corr * mask
    return jnp.linalg.solve(A, b)


def _threshold_iterate(gram, corr, lam, ridge, maxiter):
    """STLSQ fixed point for one threshold: solve → hard-threshold → repeat.

    The active set shrinks monotonically; an all-thresholded run yields the
    empty model (coefficients exactly zero).
    """
    m = gram.shape[0]
    active0 = jnp.ones((m,), bool)
    xi0 = masked_lstsq(gram, corr, active0, ridge)

    def body(carry, _):
        xi, active = carry
        active_new = (jnp.abs(xi) >= lam) & active
        xi_new = masked_lstsq(gram, corr, active_new, ridge)
        return (xi_new, active_new), None

    (xi, active), _ = jax.lax.scan(body, (xi0, active0), None, length=maxiter)
    # Unbiased refit on the selected support: the ridge steers the *path*,
    # but reported coefficients/residuals must not carry its shrinkage bias
    # (the reference's structure-then-refit discipline).
    eps_ridge = 10.0 * jnp.finfo(gram.dtype).eps * jnp.mean(jnp.diag(gram))
    xi = masked_lstsq(gram, corr, active, eps_ridge)
    xi = jnp.where(active, xi, 0.0)
    return xi, active


@dataclasses.dataclass(frozen=True)
class STLSQ:
    """Sequentially thresholded least squares over a threshold grid
    (Brunton et al. 2016; reference ``STLSQ(exp10.(-3:0.01:5))``)."""

    thresholds: Tuple[float, ...] = tuple(float(x) for x in (0.1,))
    maxiter: int = 10
    # Path-stabilizing absolute ridge (pysindy's alpha).  With normalized
    # features (gram diagonal ≈ N) this leaves well-determined directions
    # untouched (relative shrinkage ~ridge/N) while taming the near-null
    # collinear directions that otherwise blow the support path up; final
    # coefficients are always refit unbiased on the selected support.
    ridge: float = 0.05

    def fit_grid(self, gram, corr):
        lams = jnp.asarray(self.thresholds, gram.dtype)
        fn = lambda lam: _threshold_iterate(gram, corr, lam, self.ridge, self.maxiter)
        return jax.vmap(fn)(lams)  # xi: (L, m), active: (L, m)


@dataclasses.dataclass(frozen=True)
class STRRidge:
    """Sequential thresholded ridge regression (reference
    ``STRRidge(0.01)``, ``loop_recoveries.jl:120``)."""

    thresholds: Tuple[float, ...] = (0.01,)
    ridge: float = 0.01
    maxiter: int = 10

    def fit_grid(self, gram, corr):
        lams = jnp.asarray(self.thresholds, gram.dtype)
        fn = lambda lam: _threshold_iterate(
            gram, corr, lam, self.ridge, self.maxiter
        )
        return jax.vmap(fn)(lams)


@dataclasses.dataclass(frozen=True)
class SR3:
    """Sparse relaxed regularized regression (Zheng et al. 2019; reference
    ``SR3(1e-2, 0.1)``, ``loop_recoveries.jl:100``, ``seir_exposure.jl:217``).

    Minimizes ½‖y−Θξ‖² + λ·R(w) + ν/2‖ξ−w‖² by alternating a linear solve in
    ξ with a hard-threshold prox in w; final structure is refit by masked
    least squares for unbiased coefficients (the reference's two-stage
    structure-then-refit pattern, ``loop_recoveries.jl:107-125``).
    """

    thresholds: Tuple[float, ...] = (0.1,)
    nu: float = 1.0
    maxiter: int = 30

    def fit_grid(self, gram, corr):
        m = gram.shape[0]
        eye = jnp.eye(m, dtype=gram.dtype)
        A = gram + self.nu * eye
        A_inv = jnp.linalg.inv(A)

        def single(lam):
            kappa = jnp.sqrt(2.0 * lam / self.nu)

            def body(w, _):
                xi = A_inv @ (corr + self.nu * w)
                w_new = jnp.where(jnp.abs(xi) >= kappa, xi, 0.0)
                return w_new, None

            w0 = A_inv @ corr
            w, _ = jax.lax.scan(body, w0, None, length=self.maxiter)
            active = w != 0.0
            # same eps-ridge guard as the STLSQ refit: an active block with
            # more features than rows is exactly singular and would return
            # NaN coefficients marked active
            eps_ridge = (
                10.0 * jnp.finfo(gram.dtype).eps * jnp.mean(jnp.diag(gram))
            )
            xi = masked_lstsq(gram, corr, active, eps_ridge)
            return jnp.where(active, xi, 0.0), active

        lams = jnp.asarray(self.thresholds, gram.dtype)
        return jax.vmap(single)(lams)
