"""Simulation-validated sparse model selection, fully traced.

The reference selects SINDy models by statistical parsimony (AICc, CV
folds, the ``g(x)`` objectives of ``scenario_2.jl:199`` /
``loop_recoveries.jl:104``) and then checks the winner by *re-simulating
and plotting it against the data* (``scenario_1.jl:193-207``).  That last
visual step carries real selection power: when the regression targets are
a trained NN's outputs, their few-percent error is *structured* — it is
fit consistently across CV folds, so purely statistical criteria
over-select, and near-collinear supports (u₁·u₂ vs u₁⁴·u₂ on a short
orbit) tie on residual.  Re-simulation through the ODE separates them.

This module automates the visual check in a form that runs *inside* a
``vmap`` lane (SURVEY.md §2.4 — the 500-run ensemble), so the whole
candidate → simulate → select pipeline stays on device:

* :func:`best_per_support` compresses a candidate grid (e.g. an STLSQ
  λ-sweep plus exhaustive small-support fits) to the best-scoring
  candidate at each support size — a parsimony ladder.
* :func:`select_by_simulation` forms every cross-target combination of
  ladder rungs, integrates each recovered model over the data window with
  a fixed-step solver, and picks the sparsest combination whose
  trajectory reproduces the data to within ``rel_factor`` of the best
  (ties broken by trajectory error).  ``rel_floor`` widens the tolerance
  band to the noise level so the truth is never out-competed by noise
  overfitters.

Everything is static-shape: candidates are fixed-size stacks, the
combination product is a static meshgrid, and the integrator is a
``lax.scan`` — one XLA program per ensemble chunk, no host round-trips.
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.integrate import integrate_fixed

__all__ = ["best_per_support", "cv_ladder", "select_by_simulation",
           "stability_selection", "two_stage_recovery"]


def _svht_denoise_traced(theta):
    """Optimal singular-value hard threshold (Gavish & Donoho 2014), the
    traceable (jit/vmap-safe) twin of ``solve._svht_denoise`` for use inside
    ensemble lanes — the reference's ``denoise=true``
    (``loop_recoveries.jl:107``)."""
    N, m = theta.shape
    U, s, Vt = jnp.linalg.svd(theta, full_matrices=False)
    beta = min(N, m) / max(N, m)
    omega = 0.56 * beta**3 - 0.95 * beta**2 + 1.82 * beta + 1.43
    tau = omega * jnp.median(s)
    return (U * jnp.where(s >= tau, s, 0.0)) @ Vt


def two_stage_recovery(theta, Y, lams, *, nu: float = 0.1,
                       sr3_maxiter: int = 500, refit_threshold: float = 0.01,
                       refit_ridge: float = 0.01, refit_maxiter: int = 10,
                       normalize: bool = True, denoise: bool = True,
                       g=None):
    """The reference's SR3 → STRRidge two-stage recovery protocol
    (``loop_recoveries.jl:100-125``), traceable for use inside vmapped
    ensemble lanes.

    Stage 1 — structure search: SR3(ν=``nu``) swept over the threshold grid
    ``lams`` (the reference uses ``exp10.(-7:0.1:7)``; keep ``sr3_maxiter``
    high — the reference runs 50000 — because an under-converged SR3
    alternation skips support sizes along the λ path; iterations are single
    (m, m) matvecs, so hundreds are cheap) on the normalized
    (and optionally SVHT-denoised) normal equations; per target, candidates
    are scored by the reference's objective ``g(x) = x[1] < 1 ? Inf :
    norm(x, 2)`` with ``x = (L0 of coefficients, L2 error of the model)`` —
    empty models are rejected, otherwise sparsity dominates with the
    residual as tie-break.

    Stage 2 — parameter refit: the winning structure is frozen and the
    coefficients are re-estimated by STRRidge(``refit_threshold``) restricted
    to the frozen support (re-thresholding may only *drop* frozen terms,
    exactly like refitting in the reduced basis), with a final unbiased
    least-squares polish on the surviving support.

    Args:
      theta: (N, m) feature matrix Θ(X).
      Y: (N,) or (N, T) regression target(s).
      lams: SR3 threshold grid.
      g: optional replacement objective ``g(l0, l2err) -> score``
        (lower = better, ``inf`` = rejected).

    Returns ``C``: (m, T) coefficients in raw feature scale ((m,) if ``Y``
    was 1-D).
    """
    from .optimizers import SR3, masked_lstsq

    theta = jnp.asarray(theta)
    Y2 = jnp.asarray(Y)
    squeeze = Y2.ndim == 1
    if squeeze:
        Y2 = Y2[:, None]
    n_rows, m = theta.shape
    if denoise:
        theta = _svht_denoise_traced(theta)
    if normalize:
        fsc = jnp.linalg.norm(theta, axis=0) / jnp.sqrt(1.0 * n_rows)
        fsc = jnp.where(fsc > 0, fsc, 1.0)
    else:
        fsc = jnp.ones((m,), theta.dtype)
    th_n = theta / fsc
    gram = th_n.T @ th_n
    opt = SR3(thresholds=tuple(float(x) for x in lams), nu=nu,
              maxiter=sr3_maxiter)
    if g is None:
        g = lambda l0, l2: jnp.where(l0 < 1.0, jnp.inf,
                                     jnp.sqrt(l0**2 + l2**2))
    eps_ridge = 10.0 * jnp.finfo(gram.dtype).eps * jnp.mean(jnp.diag(gram))

    def per_target(y):
        ysc = jnp.sqrt(jnp.mean(y**2)) + 1e-30
        yn = (y / ysc) if normalize else y
        corr = th_n.T @ yn
        yty = jnp.sum(yn**2)
        xi, active = opt.fit_grid(gram, corr)  # (L, m)
        rss = (jnp.einsum("li,ij,lj->l", xi, gram, xi)
               - 2.0 * (xi @ corr) + yty)
        l2err = jnp.sqrt(jnp.maximum(rss, 0.0))
        l0 = active.sum(axis=1).astype(xi.dtype)
        score = g(l0, l2err)
        frozen = active[jnp.argmin(score)]

        def body(act, _):
            xi_r = masked_lstsq(gram, corr, act, refit_ridge)
            return (jnp.abs(xi_r) >= refit_threshold) & frozen, None

        act, _ = jax.lax.scan(body, frozen, None, length=refit_maxiter)
        xi_f = masked_lstsq(gram, corr, act, eps_ridge)
        xi_f = jnp.where(act, xi_f, 0.0)
        return xi_f * (ysc if normalize else 1.0) / fsc

    C = jax.vmap(per_target, in_axes=1, out_axes=1)(Y2)
    return C[:, 0] if squeeze else C


def cv_ladder(theta, y, optimizer, max_support, *, per_size: int = 1,
              fold_masks=None, n_folds: int = 4, exclude=(),
              extra_supports=None, ridge: float = 1e-7):
    """CV-scored parsimony ladder from a feature matrix and one target.

    The shared front half of the simulation-judged recovery pipeline (used
    by ``hudson_bay.py``, ``run_loops.py`` and ``seir_exposure.py``):
    normalize features by column RMS and the target by its RMS, fit the
    optimizer's full candidate grid on the normal equations (plus an
    optional exhaustive set of fixed supports), score every candidate by
    K-fold cross-validation (candidates refit on each fold's kept rows,
    residuals on the held-out rows), and compress with
    :func:`best_per_support` to the best candidate(s) per support size —
    returned in RAW feature scale, ready for :func:`select_by_simulation`.

    Args:
      theta: (N, m) feature matrix Θ(X).
      y: (N,) regression target.
      optimizer: object with ``fit_grid(gram, corr) -> (xi, active)``
        (``STLSQ``/``SR3``/``STRRidge``).
      max_support: ladder height — support sizes 1..max_support.
      per_size: distinct-support candidates kept per size (runner-ups for
        the simulation judge to separate near-aliases).
      fold_masks: (K, N) arrays, 1 = held-out rows of fold k; defaults to
        ``DataSampler(n_folds)`` contiguous folds.
      exclude: feature column indices zeroed before fitting — the
        physics-informed restriction for terms the model already carries.
      extra_supports: optional (L, m) bool masks fit exhaustively by
        masked least squares and appended to the candidate grid (greedy
        thresholding cannot un-cancel collinear groups).
      ridge: ridge used for the exhaustive ``extra_supports`` fits.

    Fully traceable (jit/vmap-safe for static shapes).

    Note: :func:`sindy` (solve.py) carries its own per-target fold-CV
    scorer inside its end-to-end pipeline (denoise → normalize → sweep →
    select); the fold-refit kernel here intentionally mirrors it.  A change
    to the CV semantics (fold weighting, held-out normalization) must be
    applied in both places.
    """
    from .optimizers import masked_lstsq
    from .solve import DataSampler

    theta = jnp.asarray(theta)
    y = jnp.asarray(y)
    n_rows = theta.shape[0]
    exclude = tuple(exclude)
    if exclude:
        theta = theta.at[:, jnp.asarray(exclude)].set(0.0)
    fsc = jnp.linalg.norm(theta, axis=0) / jnp.sqrt(1.0 * n_rows)
    fsc = jnp.where(fsc > 0, fsc, 1.0)
    th_n = theta / fsc
    if fold_masks is None:
        fold_masks = DataSampler(n_folds).masks(n_rows)
    folds = jnp.asarray(fold_masks, th_n.dtype)
    ysc = jnp.sqrt(jnp.mean(y**2)) + 1e-30
    yn = y / ysc
    if extra_supports is not None:
        extra_supports = jnp.asarray(extra_supports, bool)

    def candidates(gram, corr):
        xi, active = optimizer.fit_grid(gram, corr)
        if extra_supports is not None:
            xe = jax.vmap(
                lambda mk: masked_lstsq(gram, corr, mk, ridge)
            )(extra_supports)
            xi = jnp.concatenate([xi, jnp.where(extra_supports, xe, 0.0)])
            active = jnp.concatenate([active, extra_supports])
        return xi, active

    xi, active = candidates(th_n.T @ th_n, th_n.T @ yn)

    def fold(wb):
        keep = 1.0 - wb
        xib, _ = candidates(th_n.T @ (th_n * keep[:, None]),
                            th_n.T @ (yn * keep))
        rb = (th_n @ xib.T - yn[:, None]) * wb[:, None]
        return jnp.sum(rb**2, axis=0) / jnp.maximum(wb.sum(), 1.0)

    cv = jax.vmap(fold)(folds).mean(axis=0)
    return best_per_support(xi * ysc / fsc, active, cv, max_support,
                            per_size=per_size)


def stability_selection(theta, y, optimizer, key, *, n_subsets: int = 64,
                        frac: float = 0.7, max_support: int = 0,
                        normalize: bool = True):
    """Per-term selection frequencies over random row subsamples
    (stability selection, Meinshausen & Bühlmann 2010, arXiv:0809.2932) —
    a structure-uncertainty quantifier the reference repository has no
    analogue of: instead of ONE support, it reports how often each
    library term survives sparse regression when the data is repeatedly
    subsampled.  Terms whose frequency stays near 1 are stably
    identified; terms that flicker are noise artifacts, whatever single-
    fit criterion happened to keep them.

    TPU-native design: the B subsamples are Bernoulli row weights folded
    into the normal equations, so the whole procedure is ONE vmapped
    ``optimizer.fit_grid`` batch — no data movement, no host loop — and
    runs unchanged inside ensemble lanes (traceable for static shapes).

    Args:
      theta: (N, m) feature matrix (pointwise Θ(X) or a weak pair's G).
      y: (N,) regression target.
      optimizer: ``fit_grid(gram, corr) -> (xi, active)`` (STLSQ/SR3/…);
        its λ grid is the regularization path the frequencies maximize
        over (the M&B per-λ probability, reduced by max over the path).
      key: PRNGKey for the subsample draws.
      n_subsets / frac: number of subsamples and kept-row fraction.
      max_support: restrict the path to candidates with support size in
        [1, max_support] before the max (0 = any nonempty candidate) —
        without it the loosest λ's dense fits report every term stable.
      normalize: column-RMS feature and RMS target scaling (as the other
        front ends).

    Returns ``freq``: (m,) — ``freq[i]`` = fraction of subsamples in
    which term i is active in some path candidate within the support
    band.  A stable support is e.g. ``freq >= 0.6`` (M&B's threshold
    range 0.6–0.9).
    """
    theta = jnp.asarray(theta)
    y = jnp.asarray(y)
    n_rows, m = theta.shape
    if normalize:
        fsc = jnp.linalg.norm(theta, axis=0) / jnp.sqrt(1.0 * n_rows)
        fsc = jnp.where(fsc > 0, fsc, 1.0)
        th_n = theta / fsc
        yn = y / (jnp.sqrt(jnp.mean(y**2)) + 1e-30)
    else:
        th_n = theta
        yn = y
    keep = jax.random.bernoulli(key, frac, (n_subsets, n_rows))

    def one(w):
        wf = w.astype(th_n.dtype)
        gram = th_n.T @ (th_n * wf[:, None])
        corr = th_n.T @ (yn * wf)
        _, active = optimizer.fit_grid(gram, corr)  # (L, m)
        k = active.sum(axis=1)
        ok = k >= 1
        if max_support:
            ok = ok & (k <= max_support)
        return jnp.any(active & ok[:, None], axis=0)

    sel = jax.vmap(one)(keep)  # (B, m) bool
    return jnp.mean(sel.astype(th_n.dtype), axis=0)


def best_per_support(xi, active, score, max_support, per_size: int = 1):
    """Best candidates at each support size 1..``max_support``.

    ``xi``: (L, m) candidate coefficient rows, ``active``: (L, m) bool
    supports, ``score``: (L,) selection score (lower is better, ``inf`` =
    invalid).  Returns ``(xi_k, ok_k)`` with ``xi_k``:
    (max_support·per_size, m) and ``ok_k`` bool — rungs with no candidate
    of that size come back zeroed with ``ok_k=False``.  ``per_size > 1``
    keeps the top ``per_size`` *distinct-support* candidates per size (the
    runner-up matters when near-aliased terms — e.g. u and sin(u) on a
    short window — tie on regression score and only a simulation judge can
    separate them); rung order is size-major, so rung r has support size
    ``r // per_size + 1``.  Pass the result's rungs to
    :func:`select_by_simulation` with ``sizes=`` when ``per_size > 1``.
    """
    xi = jnp.asarray(xi)
    active = jnp.asarray(active)
    ks = active.sum(axis=1)
    score = jnp.asarray(score)

    def pick(k):
        s = jnp.where(ks == k, score, jnp.inf)
        out_xi, out_ok = [], []
        for _ in range(per_size):
            i = jnp.argmin(s)
            ok = jnp.isfinite(s[i])
            out_xi.append(jnp.where(ok, xi[i], 0.0))
            out_ok.append(ok)
            # knock out every candidate sharing the winner's support so the
            # runner-up is a genuinely different structure
            same = (active == active[i][None, :]).all(axis=1)
            s = jnp.where(same, jnp.inf, s)
        return jnp.stack(out_xi), jnp.stack(out_ok)

    xi_k, ok_k = jax.vmap(pick)(jnp.arange(1, max_support + 1))
    return xi_k.reshape(-1, xi.shape[1]), ok_k.reshape(-1)


def select_by_simulation(
    candidates: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    dense_rhs: Callable,
    u0,
    t0: float,
    t1: float,
    data,
    solver,
    n_steps: int,
    sub: int = 1,
    rel_factor: float = 1.5,
    rel_floor=0.0,
    max_rel: float = 1.0,
    refit_iters: int = 0,
    loss_floor=0.0,
    max_total_support: int = 0,
    sizes: Sequence = None,
    refit_all: bool = False,
    refit_top=1,
    refit_method: str = "bfgs",
    holdout_stride: int = 0,
):
    """Pick the sparsest candidate combination that re-simulates ``data``.

    ``candidates``: per-target ``(xi_k, ok_k)`` pairs as returned by
    :func:`best_per_support` (coefficients in *raw* feature scale).  For T
    targets with K rungs each, all K^T dense coefficient matrices
    C ∈ (m, T) are integrated with ``dense_rhs(t, u, C)`` from ``u0`` over
    ``[t0, t1]`` using ``n_steps`` fixed steps of ``solver``; every
    ``sub``-th state is compared against ``data`` ((n_save, d), with
    ``n_steps = (n_save - 1) * sub``).

    Two judging modes:

    * ``refit_iters == 0`` — regression-coefficient judging: among
      combinations with ``rel <= max(rel_factor * min_rel, rel_floor)``
      (and ``rel <= max_rel``), minimize total support, ties broken by
      ``rel``.  Cheap, but at low noise the regression coefficients carry
      the NN's structured bias, so the sparse truth can simulate *worse*
      than a denser overfit and fall outside any sane band.
    * ``refit_iters > 0`` — the scenario-1 refit judge
      (``scenario_1.py``; automates ``scenario_1.jl:193-207``): the best
      combination at each total support size 2..``max_total_support``
      becomes a finalist, each finalist's coefficients are re-optimized
      against the trajectory data (masked BFGS, ``refit_iters``
      iterations), and selection runs on the *refit* mean-squared losses
      with band ``max(rel_factor * min_loss, loss_floor)``.  A wrong
      structure stalls orders of magnitude above the noise floor under
      refit; the true one reaches it — pass the known noise floor
      (mag²·E[x̄²]) as ``loss_floor``.  Keep finalists × ``refit_iters``
      within the device watchdog budget (CLAUDE.md).  With
      ``refit_all=True`` every valid combination is refit instead of one
      finalist per size — required when same-size candidates are
      near-aliased on the window (u vs sin(u)) so the pre-refit
      trajectory error cannot pick the finalist; keep K^T small.
      ``refit_top > 1`` is the cheaper middle ground: the top ``refit_top``
      combinations per total support size (by pre-refit trajectory error)
      all become finalists, so a biased pre-refit ranking cannot hide the
      true structure behind a same-size alias — essential for ladders built
      with ``per_size > 1``.  A sequence (one entry per total size
      T..k_max) spends the refit budget where it matters: measured on the
      LV loop study at 1e-2 noise, every contains-but-not-exact selection
      had the true sparsest combination in the ladder and inside the loss
      band, but ranked 3rd/4th pre-refit — so the smallest size warrants
      exhaustive refits (``per_size**T``) while larger sizes keep top-2.

    ``holdout_stride > 0`` makes the refit judge score OUT OF SAMPLE:
    every ``holdout_stride``-th save point is excluded from the refit
    objective and the selection loss is the mean-squared residual on
    those held-out points alone (``loss_floor`` keeps its meaning — the
    held-out MSE of a perfect fit is the same noise floor).  MEASURED
    NEGATIVE RESULT on the LV study's hardest level (5e-2, judge-oracle
    playoff on the archived 500 lanes): interleaved holdout does NOT
    rescue lanes where an adversarially selected same-sparsity structure
    out-refits the truth — those structures produce smooth trajectories
    that track the noisy samples in- and out-of-sample equally (40% hard-
    lane conversion unchanged), while the 2× smaller scoring set ADDS
    variance on easy lanes (98→91%).  Widening ``loss_floor`` 1.3→3× is
    equally ineffective (the losing lanes tie on sparsity, not the band).
    Kept as an option for problems with sparser/rougher sampling where
    between-sample mismatch is informative.

    Ladders built with ``per_size > 1`` must pass their rung support
    sizes via ``sizes`` (one array per target); otherwise rung r is
    assumed to have support size r+1.

    Returns ``(C, score, k_total)``: the selected (m, T) coefficient
    matrix, its score (max-abs relative trajectory error, or refit MSE
    when ``refit_iters > 0``), and its total support size.  Traceable
    under ``jit``/``vmap`` (static shapes throughout).
    """
    u0 = jnp.asarray(u0)
    data = jnp.asarray(data)
    n_rungs = [c[0].shape[0] for c in candidates]
    grids = jnp.meshgrid(*[jnp.arange(s) for s in n_rungs], indexing="ij")
    idx = jnp.stack([g.ravel() for g in grids], axis=-1)  # (P, T)

    # (P, m, T) dense coefficient stacks + validity + total support
    Cs = jnp.stack(
        [candidates[t][0][idx[:, t]] for t in range(len(candidates))], axis=-1
    )
    ok = jnp.stack(
        [candidates[t][1][idx[:, t]] for t in range(len(candidates))], axis=-1
    ).all(axis=-1)
    if sizes is not None:
        # explicit per-rung support sizes (per_size > 1 ladders)
        k_tot = sum(jnp.asarray(sizes[t])[idx[:, t]]
                    for t in range(len(candidates)))
    else:
        # rung r of best_per_support(per_size=1) has support size r+1
        k_tot = (idx + 1).sum(axis=-1)

    data_scale = jnp.max(jnp.abs(data)) + 1e-30

    def sim_rel(C):
        _, ys = integrate_fixed(dense_rhs, u0, t0, t1, C, solver, n_steps)
        rel = jnp.max(jnp.abs(ys[::sub] - data)) / data_scale
        return jnp.where(jnp.isfinite(rel), rel, jnp.inf)

    rel = jax.vmap(sim_rel)(Cs)
    rel = jnp.where(ok, rel, jnp.inf)
    big = jnp.asarray(Cs.shape[0] * 10.0, rel.dtype)

    if refit_iters == 0:
        tol = jnp.maximum(rel_factor * jnp.min(rel), rel_floor)
        fits = rel <= jnp.minimum(tol, max_rel)
        # lexicographic (k_total, rel) over fitting combos
        key = jnp.where(fits, k_tot * big + jnp.minimum(rel, max_rel), jnp.inf)
        best = jnp.argmin(key)
        return Cs[best], rel[best], k_tot[best]

    from ..train import bfgs_minimize  # deferred: train is a sibling layer

    n_save = data.shape[0]
    if holdout_stride:
        # held-out points: every holdout_stride-th save; per-point weights
        # broadcast over the state dimension.  stride >= 2 keeps index 0
        # (the simulation seed) in the refit set, and stride <= n_save
        # guarantees a nonempty holdout (an empty one would make every
        # score 0/0 -> inf and the argmin silently arbitrary)
        assert 2 <= holdout_stride <= n_save, (
            f"holdout_stride must be in [2, {n_save}], got {holdout_stride}")
        hold = (jnp.arange(n_save) % holdout_stride) == (holdout_stride - 1)
        w_train = jnp.where(hold, 0.0, 1.0)[(...,) + (None,) * (data.ndim - 1)]
        w_hold = jnp.where(hold, 1.0, 0.0)[(...,) + (None,) * (data.ndim - 1)]
        n_hold = jnp.sum(hold) * (data.size // n_save)
    else:
        # keep the default path's traced program BYTE-IDENTICAL to the
        # unweighted form: an always-on multiply-by-ones would invalidate
        # every cached judge program (25-min TPU recompiles) for nothing
        w_train = w_hold = None

    T = len(candidates)
    if refit_all:
        # judge every valid combination (small K^T only — e.g. a single
        # target with near-aliased same-size candidates, where pre-refit
        # trajectory error cannot be trusted to pick the finalist)
        keep = jnp.isfinite(rel)
        if max_total_support:
            keep = keep & (k_tot <= max_total_support)
        C_f, ok_f, k_f = Cs, keep, k_tot
    else:
        k_max = max_total_support or int(
            sum(jnp.max(jnp.asarray(s)) for s in sizes) if sizes is not None
            else sum(c[0].shape[0] for c in candidates))
        k_sizes = list(range(T, k_max + 1))
        tops = ([int(x) for x in refit_top]
                if isinstance(refit_top, (list, tuple))
                or jnp.ndim(refit_top) > 0
                else [int(refit_top)] * len(k_sizes))
        assert len(tops) == len(k_sizes), (
            f"refit_top sequence needs one entry per total size "
            f"{k_sizes}, got {tops}")
        C_parts, ok_parts, k_parts = [], [], []
        for k, top in zip(k_sizes, tops):
            s = jnp.where((k_tot == k) & jnp.isfinite(rel), rel, jnp.inf)
            for _ in range(top):
                i = jnp.argmin(s)
                C_parts.append(Cs[i])
                ok_parts.append(jnp.isfinite(s[i]))
                k_parts.append(k)
                s = s.at[i].set(jnp.inf)
        C_f = jnp.stack(C_parts)
        ok_f = jnp.stack(ok_parts)
        k_f = jnp.asarray(k_parts)

    def refit_bfgs(C0):
        mask = (C0 != 0.0).astype(C0.dtype)

        def loss(C):
            _, ys = integrate_fixed(dense_rhs, u0, t0, t1, C * mask,
                                    solver, n_steps)
            r = ys[::sub] - data
            if holdout_stride:
                r = w_train * r
            return jnp.mean(r ** 2)

        r = bfgs_minimize(loss, C0, maxiters=refit_iters,
                          initial_stepnorm=0.01)
        if holdout_stride:
            _, ys = integrate_fixed(dense_rhs, u0, t0, t1, r.params * mask,
                                    solver, n_steps)
            val = jnp.sum((w_hold * (ys[::sub] - data)) ** 2) / n_hold
        else:
            val = r.value
        val = jnp.where(jnp.isfinite(val), val, jnp.inf)
        return val, r.params * mask

    def refit_lm(C0):
        # Gauss-Newton/LM on the trajectory residuals: the refit objective
        # is least-squares, so ~refit_iters damped-Newton steps with the
        # Jacobian's tangent sims batched *in parallel* (jacfwd) replace
        # ~50 sequential BFGS line-search evals — the judge's wall time is
        # sequential-step-latency bound, not FLOP bound, on TPU.
        mask = (C0 != 0.0).astype(C0.dtype)
        mflat = mask.ravel()
        n_res = data.size

        def r_raw(x):
            _, ys = integrate_fixed(dense_rhs, u0, t0, t1,
                                    x.reshape(C0.shape) * mask,
                                    solver, n_steps)
            return ys[::sub] - data

        def r_flat(x):
            r = r_raw(x)
            return ((w_train * r) if holdout_stride else r).ravel()

        def jac(x):
            return jax.jacfwd(r_flat)(x) * mflat[None, :]

        x0 = C0.ravel()
        r0 = r_flat(x0)
        loss0 = jnp.sum(r0 * r0)
        # masked params get a unit diagonal (their J columns are exactly 0,
        # so their step stays 0) instead of the near-singular lam*eps floor
        inert = jnp.diag(1.0 - mflat)

        def body(s, _):
            # J refreshes at the TOP of the body, gated on the previous
            # step's acceptance: a rejected iteration leaves x unchanged, so
            # recomputing there would reproduce the carried J bit-for-bit
            # while paying the full tangent-batch cost.  Placing the cond
            # here (not after the step) keeps the vmapped hot path — where
            # cond lowers to a select and both branches run — at exactly one
            # jacfwd per iteration, the same count as an unconditional
            # recompute; the unbatched path additionally skips rejections.
            x, r, J, lv, lam, acc_prev = s
            J = jax.lax.cond(acc_prev, jac, lambda _x: J, x)
            g = J.T @ r
            H = J.T @ J
            A = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-10)) + inert
            x_new = x - jnp.linalg.solve(A, g) * mflat
            r_new = r_flat(x_new)
            l_new = jnp.sum(r_new * r_new)
            acc = (l_new < lv) & jnp.all(jnp.isfinite(r_new))
            lam = jnp.clip(jnp.where(acc, lam * 0.3, lam * 3.0), 1e-10, 1e10)
            return (jnp.where(acc, x_new, x), jnp.where(acc, r_new, r),
                    J, jnp.where(acc, l_new, lv), lam, acc), None

        J0 = jnp.zeros((n_res, x0.size), x0.dtype)
        (x, _, _, lv, _, _), _ = jax.lax.scan(
            body, (x0, r0, J0, loss0, jnp.asarray(1e-3, x0.dtype),
                   jnp.asarray(True)), None,
            length=refit_iters)
        if holdout_stride:
            r_h = w_hold * r_raw(x)
            val = jnp.sum(r_h * r_h) / n_hold
        else:
            val = lv / n_res
        val = jnp.where(jnp.isfinite(val), val, jnp.inf)
        return val, x.reshape(C0.shape) * mask

    assert refit_method in ("bfgs", "lm"), refit_method
    refit = refit_bfgs if refit_method == "bfgs" else refit_lm
    loss_f, C_ref = jax.vmap(refit)(C_f)
    loss_f = jnp.where(ok_f, loss_f, jnp.inf)
    tol = jnp.maximum(rel_factor * jnp.min(loss_f), loss_floor)
    # isfinite guard: with no valid finalist tol is inf and inf <= inf would
    # "fit", and inf/inf below would poison the key with NaN
    fits = (loss_f <= tol) & jnp.isfinite(loss_f)
    norm = jnp.minimum(loss_f / (jnp.min(loss_f) + 1e-30), big - 1.0)
    norm = jnp.where(jnp.isfinite(norm), norm, big - 1.0)
    key = jnp.where(fits, k_f * big + norm, jnp.inf)
    best = jnp.argmin(key)
    return C_ref[best], loss_f[best], k_f[best]
