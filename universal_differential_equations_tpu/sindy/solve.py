"""SINDy solve front-end: problems, model selection, recovered models.

Mirrors the reference's sparse-recovery pipeline (SURVEY.md §3.4, C19/C21):

* ``DirectDataDrivenProblem(X, Y)`` — fit Y = Ξ·Θ(X) (``scenario_1.jl:166``),
* ``ContinuousDataDrivenProblem(X, t[, DX][, kernel])`` — derivative targets,
  estimated by kernel collocation from noisy data when not given
  (``hudson_bay.jl:48``, C20),
* ``sindy(problem, basis, optimizer)`` with ``denoise`` (optimal SVHT),
  ``normalize``, cross-validation ``sampler`` batches, and model selection by
  AICc or a custom objective g(k, rss, N) (``scenario_2.jl:199``),
* ``SINDyResult`` — printable equations, ``parameters()``/``parameter_map()``
  and a jit-compiled recovered RHS for re-simulation, extrapolation, and
  gradient refit of the recovered parameters (``scenario_1.jl:183-207``,
  ``hudson_bay.jl:197-210``).

The whole λ-grid × target × CV-fold sweep is a single jitted/vmapped XLA
program; only the final argmin selection returns to the host.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

import itertools

from .basis import Basis
from .collocation import collocate_data
from .optimizers import STLSQ, masked_lstsq

__all__ = [
    "DirectDataDrivenProblem",
    "ContinuousDataDrivenProblem",
    "DataSampler",
    "sindy",
    "SINDyResult",
]


@dataclasses.dataclass(frozen=True)
class DirectDataDrivenProblem:
    """Fit targets Y directly against Θ(X) (``scenario_1.jl:166-167``)."""

    X: jnp.ndarray  # (N, n)
    Y: jnp.ndarray  # (N, d)


@dataclasses.dataclass(frozen=True)
class ContinuousDataDrivenProblem:
    """Fit estimated derivatives DX against Θ(X).

    When ``DX`` is None, both the smoothed states and their derivatives are
    estimated by kernel collocation (``hudson_bay.jl:48``, C20).
    """

    X: jnp.ndarray
    t: jnp.ndarray
    DX: Optional[jnp.ndarray] = None
    kernel: str = "gaussian"
    bandwidth: Optional[float] = None

    def realize(self):
        if self.DX is not None:
            return self.X, self.DX
        Xs, DX = collocate_data(self.X, self.t, kernel=self.kernel,
                                bandwidth=self.bandwidth)
        return Xs, DX


@dataclasses.dataclass(frozen=True)
class DataSampler:
    """Cross-validation batching for model selection
    (``sampler=DataSampler(Batcher(n=4,shuffle=true))``, ``scenario_1.jl:172``)."""

    n: int = 4
    shuffle: bool = True
    seed: int = 0

    def masks(self, N):
        idx = np.arange(N)
        if self.shuffle:
            np.random.default_rng(self.seed).shuffle(idx)
        masks = np.zeros((self.n, N), dtype=np.float64)
        for b, chunk in enumerate(np.array_split(idx, self.n)):
            masks[b, chunk] = 1.0
        return masks  # 1 = held-out rows of fold b


def _svht_denoise(X):
    """Optimal singular-value hard threshold (Gavish & Donoho 2014) —
    the reference's ``denoise=true`` option, applied to the candidate matrix
    Θ (whose singular spectrum has enough bulk for the median rule)."""
    X = np.asarray(X)
    N, n = X.shape
    U, s, Vt = np.linalg.svd(X, full_matrices=False)
    beta = min(N, n) / max(N, n)
    omega = 0.56 * beta**3 - 0.95 * beta**2 + 1.82 * beta + 1.43
    tau = omega * np.median(s)
    s_thr = np.where(s >= tau, s, 0.0)
    return jnp.asarray(U @ np.diag(s_thr) @ Vt)


def _aicc(k, rss, N):
    k = jnp.asarray(k, jnp.float64 if rss.dtype == jnp.float64 else jnp.float32)
    rss = jnp.maximum(rss, 1e-30)
    aic = N * jnp.log(rss / N) + 2.0 * k
    corr = 2.0 * k * (k + 1.0) / jnp.maximum(N - k - 1.0, 1.0)
    return aic + corr


def sindy(
    problem,
    basis: Basis,
    optimizer=None,
    *,
    normalize: bool = False,
    denoise: bool = False,
    sampler: Optional[DataSampler] = None,
    selection: Union[str, Callable] = "aicc",
    cv_tolerance: float = 3.0,
    precision: str = "auto",
    exhaustive_k: int = 0,
) -> "SINDyResult":
    """Sparse recovery: returns the best model per target equation across the
    optimizer's threshold grid.

    ``exhaustive_k > 0`` additionally evaluates *every* support of size
    ≤ exhaustive_k by masked least squares (all vmapped — a few hundred m×m
    solves are one fused device program).  Iterative thresholding cannot
    un-cancel collinear groups, so on nearly-collinear libraries the greedy
    path skips exactly the sparse supports that extrapolate; exhaustive
    small-support search guarantees they compete in selection.

    ``precision="auto"`` runs the (tiny) normal-equation sweep in float64 on
    the host CPU when the session is float32: polynomial libraries on
    trajectories reach cond(Θ) ~ 1e7+, and the gram squares it — f32 on TPU
    visibly corrupts recovered structures.  The feature-matrix construction
    stays on the accelerator; only the m×m solves are re-run in f64.
    "device" forces the session-dtype on-device sweep.
    """
    from .weak import WeakDataDrivenProblem

    optimizer = STLSQ() if optimizer is None else optimizer
    theta_raw = None
    if isinstance(problem, WeakDataDrivenProblem):
        # weak-form rows: the regression pair is (∫φΘ(u), -∫φ'u - ∫φf_known)
        # — the feature matrix is already integrated, so the "sample count"
        # below is the number of test windows
        theta_raw, Y = problem.realize(basis)
    elif isinstance(problem, ContinuousDataDrivenProblem):
        X, Y = problem.realize()
    else:
        X, Y = problem.X, problem.Y
    Y = jnp.asarray(Y)
    if Y.ndim == 1:
        Y = Y[:, None]
    d = Y.shape[1]

    if theta_raw is None:
        theta_raw = basis.theta(jnp.asarray(X))  # (N, m)
    N = theta_raw.shape[0]
    if denoise:
        theta_raw = _svht_denoise(theta_raw)
    m = theta_raw.shape[1]
    if normalize:
        # Solve in the fully normalized frame — unit-RMS feature columns AND
        # unit-RMS targets — so thresholds compare scale-free coefficients
        # regardless of the physical magnitudes (the SEIR exposure term is
        # ~1e-6; thresholding raw coefficients there is meaningless).
        scale = jnp.linalg.norm(theta_raw, axis=0) / jnp.sqrt(N)
        scale = jnp.where(scale > 0, scale, 1.0)
        y_scale = jnp.sqrt(jnp.mean(Y**2, axis=0))
        y_scale = jnp.where(y_scale > 0, y_scale, 1.0)
    else:
        scale = jnp.ones((m,), theta_raw.dtype)
        y_scale = jnp.ones((d,), theta_raw.dtype)
    theta = theta_raw / scale
    Y = Y / y_scale

    if selection == "aicc":
        score_fn = _aicc
    elif callable(selection):
        score_fn = selection
    else:
        raise ValueError(f"unknown selection {selection!r}")

    data_dtype = theta.dtype

    if exhaustive_k > 0:
        sup = [np.zeros(m, bool)]
        for k in range(1, exhaustive_k + 1):
            for c in itertools.combinations(range(m), k):
                row = np.zeros(m, bool)
                row[list(c)] = True
                sup.append(row)
        support_masks = np.stack(sup)
    else:
        support_masks = None

    @jax.jit
    def sweep(theta, Y):
        gram = theta.T @ theta
        corrs = theta.T @ Y  # (m, d)
        eps_r = 10.0 * jnp.finfo(theta.dtype).eps * jnp.mean(jnp.diag(gram))

        def candidates(gram_x, corr_x):
            """Grid-path candidates plus exhaustive small supports."""
            xi, active = optimizer.fit_grid(gram_x, corr_x)  # (L, m)
            if support_masks is not None:
                masks = jnp.asarray(support_masks)
                xi_e = jax.vmap(
                    lambda mk: masked_lstsq(gram_x, corr_x, mk, eps_r)
                )(masks)
                xi_e = jnp.where(masks, xi_e, 0.0)
                xi = jnp.concatenate([xi, xi_e])
                active = jnp.concatenate([active, masks])
            return xi, active

        def per_target(corr, y):
            xi, active = candidates(gram, corr)  # (L+C, m)
            resid = theta @ xi.T - y[:, None]  # (N, L)
            ks = active.sum(axis=1)
            rss = jnp.sum(resid**2, axis=0)  # (L,)
            # Relative floor: on exactly-representable targets every candidate
            # hits rounding-level rss and log-likelihood differences are pure
            # noise — flooring ties them so the sparsity penalty decides.
            # The rounding level follows the *source* feature dtype (an f32
            # TPU theta carries ~6e-8 relative noise even when the sweep
            # itself runs in f64).
            eps_src = jnp.finfo(data_dtype).eps
            floor = jnp.maximum((50.0 * eps_src) ** 2, 1e-20) * jnp.sum(y**2) + 1e-300
            if sampler is None:
                scores = score_fn(ks, jnp.maximum(rss, floor), N)
                best = jnp.argmin(scores)
            else:
                w = jnp.asarray(sampler.masks(N), theta.dtype)  # (B, N)

                def fold(wb):
                    keep = 1.0 - wb  # train rows
                    gram_b = theta.T @ (theta * keep[:, None])
                    corr_b = theta.T @ (y * keep)
                    xi_b, act_b = candidates(gram_b, corr_b)
                    res_b = (theta @ xi_b.T - y[:, None]) * wb[:, None]
                    return jnp.sum(res_b**2, axis=0) / jnp.maximum(wb.sum(), 1.0)

                cv = jax.vmap(fold)(w)  # (B, L)
                cv_mean = jnp.maximum(cv.mean(axis=0), floor / N)
                big = jnp.asarray(jnp.inf, cv_mean.dtype)
                if callable(selection):
                    # custom objective g(k, rss, N) scores the held-out
                    # errors directly (`scenario_2.jl:199`: the objective IS
                    # the parsimony rule, so no cutoff heuristic on top)
                    scores = score_fn(ks, cv_mean * N, N)
                    best = jnp.argmin(scores)
                else:
                    # Parsimony rule: the sparsest model whose CV error is
                    # within ``cv_tolerance``× of the best.  Removing a
                    # *needed* term inflates held-out error by orders of
                    # magnitude; spurious terms buy only O(1) factors — so a
                    # generous factor selects the true support robustly (the
                    # role of the reference's Batcher sampler,
                    # ``scenario_1.jl:172``).
                    cutoff = cv_tolerance * jnp.min(cv_mean)
                    ok = cv_mean <= cutoff
                    k_min = jnp.min(jnp.where(ok, ks, jnp.iinfo(jnp.int32).max))
                    cand = ok & (ks == k_min)
                    best = jnp.argmin(jnp.where(cand, cv_mean, big))
                    scores = cv_mean
            return xi[best], active[best], rss[best], ks[best], scores[best], best

        return jax.vmap(per_target, in_axes=(1, 1))(corrs, Y)

    if precision == "auto" and theta.dtype == jnp.float32:
        host = jax.devices("cpu")[0]
        with jax.enable_x64(True), jax.default_device(host):
            theta64 = jnp.asarray(np.asarray(theta), jnp.float64)
            Y64 = jnp.asarray(np.asarray(Y), jnp.float64)
            out = sweep(theta64, Y64)
            out = [np.asarray(v) for v in out]
    else:
        out = [np.asarray(v) for v in sweep(theta, Y)]
    xi, active, rss, ks, scores, best_idx = out
    # undo target normalization: raw-frame coefficients and residuals
    ysc = np.asarray(y_scale)
    xi = xi * ysc[:, None]
    rss = rss * ysc**2
    n_grid_candidates = len(optimizer.thresholds)
    # prune numerically-zero survivors (representable targets leave
    # O(eps)-coefficient artifacts on collinear features)
    tiny = np.maximum(1e-8, 100.0 * float(jnp.finfo(data_dtype).eps)) * np.max(
        np.abs(xi), axis=1, keepdims=True
    )
    active = active & (np.abs(xi) > tiny)
    xi = np.where(active, xi, 0.0)
    ks = active.sum(axis=1)
    xi = xi / np.asarray(scale)[None, :]  # back to the raw-feature frame
    thresholds = np.asarray(optimizer.thresholds)
    return SINDyResult(
        basis=basis,
        coefficients=np.asarray(xi).T,  # (m, d)
        active=np.asarray(active).T.astype(bool),  # (m, d)
        l2_error=np.sqrt(np.asarray(rss)),
        sparsity=np.asarray(ks),
        aicc=np.asarray(_aicc(jnp.asarray(ks), jnp.asarray(rss), N)),
        scores=np.asarray(scores),
        # winners drawn from the exhaustive-support grid (index past the
        # threshold sweep) have no threshold — report NaN, not a clamped
        # grid value the sweep never produced
        chosen_thresholds=np.where(
            np.asarray(best_idx) < n_grid_candidates,
            thresholds[np.minimum(np.asarray(best_idx), n_grid_candidates - 1)],
            np.nan,
        ),
    )


@dataclasses.dataclass
class SINDyResult:
    """Recovered sparse model (the reference's printable, callable result —
    ``scenario_1.jl:176-190``; metrics API of ``loop_evaluation.jl:54-56``)."""

    basis: Basis
    coefficients: np.ndarray  # (m, d)
    active: np.ndarray  # (m, d) bool
    l2_error: np.ndarray  # (d,)
    sparsity: np.ndarray  # (d,)
    aicc: np.ndarray  # (d,)
    scores: np.ndarray  # (d,)
    chosen_thresholds: np.ndarray  # (d,)

    # -- inspection ---------------------------------------------------------
    def equations(self, lhs: str = "du", digits: int = 4):
        names = self.basis.names
        eqs = []
        for eq in range(self.coefficients.shape[1]):
            parts = []
            for j in range(self.coefficients.shape[0]):
                if self.active[j, eq]:
                    coef = self.coefficients[j, eq]
                    term = f"{coef:+.{digits}g}"
                    if names[j] != "1":
                        term += f"*{names[j]}"
                    parts.append(term)
            rhs_str = " ".join(parts) if parts else "0"
            eqs.append(f"{lhs}{eq+1}/dt = {rhs_str}")
        return eqs

    def __repr__(self):
        return "SINDyResult(\n  " + "\n  ".join(self.equations()) + "\n)"

    def parameters(self) -> np.ndarray:
        """Active coefficient values, equation-major (reference
        ``parameters(res)``)."""
        vals = []
        for eq in range(self.coefficients.shape[1]):
            vals.extend(self.coefficients[self.active[:, eq], eq])
        return np.asarray(vals)

    def parameter_map(self):
        names = self.basis.names
        out = []
        for eq in range(self.coefficients.shape[1]):
            for j in range(self.coefficients.shape[0]):
                if self.active[j, eq]:
                    out.append((f"eq{eq+1}:{names[j]}", float(self.coefficients[j, eq])))
        return out

    # -- executable model (C21) --------------------------------------------
    def _scatter_indices(self):
        # equation-major, matching parameters() ordering
        cols, rows = np.nonzero(self.active.T)
        return rows, cols

    def rhs(self):
        """Jitted ODE right-hand side ``f(t, u, p)`` with ``p`` the active
        coefficient vector — recovered equations → executable ODE
        (``scenario_1.jl:183-191``, ``modelingtoolkitize`` analogue)."""
        rows, cols = self._scatter_indices()
        m, d = self.coefficients.shape
        basis = self.basis

        def f(t, u, p):
            C = jnp.zeros((m, d), dtype=u.dtype).at[rows, cols].set(p)
            return basis.theta(u) @ C

        return f

    def __call__(self, u, p=None, t=None):
        if p is None:
            p = jnp.asarray(self.parameters())
        return self.rhs()(t, jnp.asarray(u), jnp.asarray(p))
