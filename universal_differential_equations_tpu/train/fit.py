"""Training drivers: the ``Optimization.solve`` / ``Flux.train!`` equivalent.

Covers SURVEY.md C17: a ``fit`` loop with a jitted update step, host-side
callbacks for loss logging / early stop / checkpoint hooks
(``scenario_1.jl:99-118``), early-exit on a loss threshold
(``Fisher-KPP-CNN-Fourier.jl:225``), and LR-decay-on-plateau scheduling
(``neural_pde_rayleigh_taylor_instability.jl:175-181``).

TPU shape: the optimizer loop runs as ``lax.scan`` chunks of
``callback_every`` steps — one device program per chunk, host round-trips
only at callback boundaries.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from .bfgs import BFGSResult, bfgs_minimize

__all__ = ["fit", "fit_bfgs", "FitResult", "reduce_on_plateau"]


@dataclasses.dataclass
class FitResult:
    params: Any
    losses: jnp.ndarray  # (num_steps,)
    num_steps: int
    stopped_early: bool = False
    opt_state: Any = None  # final optimizer state (resume / cross-stage LR)

    @property
    def final_loss(self):
        return float(self.losses[self.num_steps - 1]) if self.num_steps else float("inf")

    # reference naming: res.minimizer / res.u (Optimization.jl)
    @property
    def minimizer(self):
        return self.params


def fit(
    loss_fn: Callable,
    params,
    optimizer: optax.GradientTransformation,
    maxiters: int,
    *,
    callback: Optional[Callable] = None,
    callback_every: int = 50,
    early_stop_loss: Optional[float] = None,
    opt_state=None,
) -> FitResult:
    """Minimize ``loss_fn(params)`` with an optax optimizer.

    ``callback(step, loss, params) -> bool`` is invoked on the host every
    ``callback_every`` steps; returning True stops training (the reference's
    callback protocol, ``scenario_1.jl:97-105``).

    ``opt_state``: pass a previous ``FitResult.opt_state`` to continue an
    optimizer across ``fit`` calls (e.g. epoch loops with an LR schedule via
    ``optax.inject_hyperparams``) instead of re-initializing ADAM moments.
    """
    if opt_state is None:
        opt_state = optimizer.init(params)

    def step(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def make_runner(n):
        @jax.jit
        def run(params, opt_state):
            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), None, length=n
            )
            return params, opt_state, losses

        return run

    runners = {}
    all_losses = []
    steps_done = 0
    stopped = False
    while steps_done < maxiters:
        chunk = min(callback_every, maxiters - steps_done)
        if chunk not in runners:
            runners[chunk] = make_runner(chunk)
        params, opt_state, losses = runners[chunk](params, opt_state)
        steps_done += chunk
        all_losses.append(losses)
        last = float(losses[-1])
        if callback is not None and callback(steps_done, last, params):
            stopped = True
            break
        if early_stop_loss is not None and last < early_stop_loss:
            stopped = True
            break
    return FitResult(
        params=params,
        losses=jnp.concatenate(all_losses) if all_losses else jnp.zeros((0,)),
        num_steps=steps_done,
        opt_state=opt_state,
        stopped_early=stopped,
    )


def fit_bfgs(loss_fn, params, maxiters=1000, **kw) -> BFGSResult:
    """BFGS refinement stage (reference ADAM→BFGS chaining,
    ``scenario_1.jl:114-118``)."""
    return bfgs_minimize(loss_fn, params, maxiters=maxiters, **kw)


def reduce_on_plateau(lr0: float, *, factor: float = 0.1, patience: int = 2,
                      min_lr: float = 1e-8):
    """Stateful host-side LR schedule: divide by ``1/factor`` after
    ``patience`` non-improving callback windows (the climate training loop's
    schedule, ``neural_pde_rayleigh_taylor_instability.jl:175-181``).

    Returns a single ``update(loss) -> lr`` callable: feed it the loss from
    the fit callback and pass the returned learning rate to the optimizer
    (e.g. via ``optax.inject_hyperparams`` and writing
    ``opt_state.hyperparams["learning_rate"]``).
    """
    state = {"best": float("inf"), "stale": 0, "lr": lr0}

    def update(loss):
        if loss < state["best"] - 1e-12:
            state["best"] = loss
            state["stale"] = 0
        else:
            state["stale"] += 1
            if state["stale"] > patience:
                state["lr"] = max(state["lr"] * factor, min_lr)
                state["stale"] = 0
        return state["lr"]

    return update
