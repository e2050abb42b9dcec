"""Solution containers and on-device dense output.

Covers the reference's ``ODESolution`` usage surface: ``Array(solution)`` on a
``saveat`` grid (``LotkaVolterra/scenario_1.jl:41-44``), continuous evaluation
``sol(t)`` and derivative interpolation ``sol(t, Val{1})`` used as ideal SINDy
targets (``scenario_1.jl:46``, SURVEY.md C2).

Dense output is a fixed-capacity buffer of accepted steps ``(t_i, y_i, f_i)``
with Hermite interpolation between them — static shapes throughout so the
whole thing lives on device, vmaps, and evaluates as one gathered, fused
computation (no host round-trips).

Interpolation order scales with the solver (the reference's solver-order
interpolants: Tsit5's free 4th-order / Vern7's 7th-order dense output, C1/C2):
``nodes`` stored step points enter a Hermite–Birkhoff window of polynomial
degree ``2·nodes − 1`` (each node contributes value and derivative).  The
default ``nodes=2`` is the classic cubic Hermite (4th-order accurate, matching
Tsit5's free interpolant); adaptive RK solvers advertise ``dense_nodes`` so
5th-order methods interpolate with quintics (local error O(h⁶)) and Vern7 with
septics (O(h⁸)) — no extra stages, RHS evaluations, or storage: the window
reuses the neighbouring accepted-step nodes already in the buffer.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["DenseInterpolation", "Solution"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseInterpolation:
    """Hermite dense output over the accepted-step grid.

    Buffers have static capacity ``max_steps + 1``; ``num_points`` (a traced
    int) gives the number of valid entries.  Entries past ``num_points`` hold
    ``t = +inf`` so that ``searchsorted`` lands queries in the last valid
    interval.

    ``nodes`` (static) sets the interpolation window: the degree-``2·nodes−1``
    Hermite–Birkhoff polynomial through ``nodes`` consecutive step points'
    values and derivatives.  ``nodes=2`` is cubic Hermite; solves with fewer
    than ``nodes`` stored points fall back to the cubic automatically.  Value
    and first derivative are continuous at the step knots for any window size
    (adjacent windows share the knot's ``(y, f)`` data).
    """

    ts: jnp.ndarray  # (cap,)
    ys: jnp.ndarray  # (cap, dim)
    fs: jnp.ndarray  # (cap, dim)  RHS values at ts
    num_points: jnp.ndarray  # scalar int32
    direction: jnp.ndarray  # scalar, +1.0 or -1.0
    nodes: int = dataclasses.field(default=2, metadata=dict(static=True))

    @property
    def t0(self):
        return self.ts[0] * self.direction

    @property
    def t1(self):
        cap = self.ts.shape[0]
        idx = jnp.clip(self.num_points - 1, 0, cap - 1)
        return self.ts[idx] * self.direction

    def _interval(self, t):
        """Locate the interval index for internal (direction-scaled) time t."""
        cap = self.ts.shape[0]
        hi = jnp.clip(self.num_points - 1, 1, cap - 1)
        idx = jnp.searchsorted(self.ts, t, side="right") - 1
        return jnp.clip(idx, 0, hi - 1)

    def _cubic(self, i, t, derivative: bool):
        """Cubic Hermite on interval ``[ts[i], ts[i+1]]`` at internal time t."""
        t0, t1 = self.ts[i], self.ts[i + 1]
        y0, y1 = self.ys[i], self.ys[i + 1]
        f0, f1 = self.fs[i], self.fs[i + 1]
        # Degenerate intervals: a zero-step solve (num_points == 1) pairs the
        # initial point with an untouched +inf buffer slot — guard h == 0 AND
        # h == inf or the f-weighted terms produce 0·inf = NaN at s = 0.
        h = t1 - t0
        h = jnp.where(jnp.isfinite(h) & (h != 0), h, jnp.ones_like(h))
        s = (t - t0) / h
        if not derivative:
            h00 = (1 + 2 * s) * (1 - s) ** 2
            h10 = s * (1 - s) ** 2
            h01 = s * s * (3 - 2 * s)
            h11 = s * s * (s - 1)
            return h00 * y0 + (h10 * f0 + h11 * f1) * h + h01 * y1
        # d/dt of the Hermite basis (chain rule through s = (t - t0)/h);
        # an extra `direction` factor converts back to user time.
        dh00 = 6 * s * (s - 1) / h
        dh10 = (3 * s * s - 4 * s + 1) / h
        dh01 = -6 * s * (s - 1) / h
        dh11 = (3 * s * s - 2 * s) / h
        val = dh00 * y0 + (dh10 * f0 + dh11 * f1) * h + dh01 * y1
        return val * self.direction

    def _windowed(self, i, t, derivative: bool):
        """Degree-``2m−1`` Hermite–Birkhoff window around interval ``i``.

        Newton divided differences over the doubled node sequence
        ``[t_w, t_w, t_{w+1}, t_{w+1}, …]`` (each repeated node supplies the
        stored RHS value as the slope constraint); the window of ``m = nodes``
        step points is chosen so adjacent intervals share their knot's data —
        value and slope stay continuous across knots.  Local error O(h^{2m}).
        """
        m = self.nodes
        cap = self.ts.shape[0]
        n = self.num_points
        ok = n >= m
        # Window start: one node left of the interval for even windows
        # (centred), right-biased otherwise; clipped into the valid prefix.
        w = jnp.clip(i - (m - 2) // 2, 0, jnp.maximum(n - m, 0))
        idx = jnp.clip(w + jnp.arange(m), 0, cap - 1)
        tn = self.ts[idx]
        # Short solves (n < m) divert to the cubic below; feed the window
        # distinct dummy nodes so its untaken divided differences stay finite
        # (the +inf slots past num_points would otherwise produce inf−inf).
        tn = jnp.where(ok, tn, jnp.arange(m, dtype=tn.dtype))
        yn = jnp.where(ok, self.ys[idx], 0.0)
        fn = jnp.where(ok, self.fs[idx], 0.0)

        # Divided-difference table on z = [t_0, t_0, t_1, t_1, …] (2m entries,
        # unrolled: m ≤ 4).  First column: slopes at repeated nodes are f_k.
        z = [tn[k // 2] for k in range(2 * m)]
        col = []
        for j in range(2 * m - 1):
            if j % 2 == 0:
                col.append(fn[j // 2])
            else:
                k = j // 2
                col.append((yn[k + 1] - yn[k]) / (tn[k + 1] - tn[k]))
        coeffs = [yn[0], col[0]]
        for r in range(2, 2 * m):
            col = [
                (col[j + 1] - col[j]) / (z[j + r] - z[j])
                for j in range(2 * m - r)
            ]
            coeffs.append(col[0])

        # Horner evaluation of the Newton form with analytic derivative.
        p = coeffs[-1]
        dp = jnp.zeros_like(p)
        for k in range(2 * m - 2, -1, -1):
            dt = t - z[k]
            dp = dp * dt + p
            p = coeffs[k] + p * dt
        if derivative:
            return dp * self.direction, ok
        return p, ok

    def _hermite(self, t, derivative: bool):
        t = t * self.direction
        # Clamp to the covered range: a failed/truncated solve (divergence,
        # step-budget exhaustion) holds its last valid state instead of
        # extrapolating the local polynomial to astronomical values — the
        # analogue of the reference's truncated solution arrays on failure,
        # and what keeps ensemble fault-masking losses finite (SURVEY.md §5).
        cap = self.ts.shape[0]
        last = self.ts[jnp.clip(self.num_points - 1, 0, cap - 1)]
        t = jnp.clip(t, self.ts[0], last)
        i = self._interval(t)
        if self.nodes <= 2:
            return self._cubic(i, t, derivative)
        win, ok = self._windowed(i, t, derivative)
        return jnp.where(ok, win, self._cubic(i, t, derivative))

    def evaluate(self, t):
        """y(t) for scalar or array ``t`` (vectorized via vmap)."""
        t = jnp.asarray(t)
        if t.ndim == 0:
            return self._hermite(t, derivative=False)
        return jax.vmap(lambda tt: self._hermite(tt, derivative=False))(t)

    def derivative(self, t):
        """dy/dt(t) — the reference's ``sol(t, Val{1})`` (SURVEY.md C2)."""
        t = jnp.asarray(t)
        if t.ndim == 0:
            return self._hermite(t, derivative=True)
        return jax.vmap(lambda tt: self._hermite(tt, derivative=True))(t)

    def __call__(self, t, nu: int = 0):
        if nu == 0:
            return self.evaluate(t)
        if nu == 1:
            return self.derivative(t)
        raise ValueError("only nu in (0, 1) supported")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Solution:
    """Result of ``solve``.

    ``ts``/``ys`` are the ``saveat`` grid (or ``(t0, t1)`` endpoints when no
    ``saveat`` was given).  ``ys`` leaves have shape ``(len(ts), *state)``.
    ``success`` is False where the integrator hit ``max_steps`` or a dt
    underflow (the per-run fault signal used by the ensemble layer in place of
    the reference's try/catch — ``run_loops.jl:57-61``).
    """

    ts: jnp.ndarray
    ys: Any
    t_final: jnp.ndarray
    y_final: Any
    success: jnp.ndarray
    num_accepted: jnp.ndarray
    num_rejected: jnp.ndarray
    num_rhs_evals: jnp.ndarray
    dense: Optional[DenseInterpolation] = None
    # Differentiable Σ of tolerance-normalized local error norms over step
    # attempts (arXiv:2105.03918's solver-heuristic regularizer): add
    # ``weight * sol.error_sum`` to a training loss to learn dynamics that
    # are cheap to integrate.  The per-attempt norm is ε-smoothed
    # (sqrt(mean(ratio²) + 1e-12)) so the gradient is zero — not NaN — at
    # exactly-zero local error, and non-finite ratios are zeroed so
    # rejected blow-up attempts add nothing.  Populated on the bounded-scan
    # paths (``DiscreteAdjoint``/``ForwardSensitivity``); None elsewhere.
    error_sum: Optional[jnp.ndarray] = None
    _unravel: Optional[Callable] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    def __call__(self, t, nu: int = 0):
        if self.dense is None:
            raise ValueError("solve(..., dense=True) required for interpolation")
        flat = self.dense(t, nu)
        if self._unravel is None:
            return flat
        if flat.ndim == 1:
            return self._unravel(flat)
        return jax.vmap(self._unravel)(flat)

    @property
    def stats(self):
        return dict(
            num_accepted=self.num_accepted,
            num_rejected=self.num_rejected,
            num_rhs_evals=self.num_rhs_evals,
        )
