"""Multiple shooting for long-horizon UDE training (SURVEY.md C18).

The reference uses library ``multiple_shoot(p, ode_data, tsteps, prob, loss,
continuity_term; group_size)`` (``hudson_bay.jl:107-117``) and a hand-rolled
per-segment loss (``scenario_2.jl:113-124``).  TPU-native design: every
segment is initialized at its data point and solved *concurrently* under one
``vmap`` — the natural TPU win called out in SURVEY.md §2.4 (segments are the
"sequence parallelism" axis of this domain) — with a continuity penalty tying
each segment's end to the next segment's start.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..adjoint.sensitivity import DiscreteAdjoint
from ..api import solve
from ..core.problem import ODEProblem, remake

__all__ = ["multiple_shoot", "shooting_windows"]


def shooting_windows(num_points: int, group_size: int):
    """Segment index windows with one-point overlap (DiffEqFlux semantics):
    starts at 0, g-1, 2(g-1), …; a ragged tail is clamped to the last index
    and masked out of the loss."""
    if group_size < 2:
        raise ValueError(f"group_size must be >= 2, got {group_size}")
    stride = group_size - 1
    n_seg = max(1, -(-(num_points - 1) // stride))
    starts = jnp.arange(n_seg) * stride
    offs = jnp.arange(group_size)
    idx = starts[:, None] + offs[None, :]
    mask = idx <= (num_points - 1)
    idx = jnp.clip(idx, 0, num_points - 1)
    return idx, mask.astype(jnp.float32)


def multiple_shoot(
    params,
    data,
    ts,
    rhs: Callable,
    *,
    group_size: int = 5,
    continuity_term: float = 100.0,
    solver=None,
    rtol: float = 1e-6,
    atol: float = 1e-6,
    adjoint=None,
    max_steps: int = 256,
    loss_fn: Optional[Callable] = None,
    mesh=None,
    mesh_axis: str = None,
):
    """Segmented trajectory loss (``hudson_bay.jl:115-117``).

    Args:
      params: RHS parameters (differentiable pytree).
      data: (N, dim) observations at times ``ts`` (N,).
      rhs: ``f(t, u, params)``.
      group_size / continuity_term: reference's knobs (e.g. 5 / 200).
      loss_fn: per-segment data loss ``(pred, target, mask) -> scalar``;
        defaults to masked squared error.
      mesh / mesh_axis: optional ``jax.sharding.Mesh`` (+ axis name,
        default the mesh's first axis): the segment batch — this domain's
        "sequence parallelism" axis (SURVEY.md §2.4) — is sharding-
        constrained over it, so under ``jit`` XLA places
        ``n_seg / mesh_size`` vmapped segment solves per device and
        reduces the data/continuity sums with a ``psum`` over ICI.
        Parameters replicate (they are tiny).  Best with ``n_seg`` a
        multiple of the mesh size; ragged cases are padded by GSPMD.

    Returns scalar loss = Σ segment data loss + continuity_term · Σ
    ‖pred_end(i) − data_start(i+1)‖².
    """
    from ..solvers.runge_kutta import Tsit5

    solver = Tsit5() if solver is None else solver
    adjoint = DiscreteAdjoint() if adjoint is None else adjoint
    data = jnp.asarray(data)
    ts = jnp.asarray(ts)
    N = data.shape[0]
    idx, mask = shooting_windows(N, group_size)
    n_seg = idx.shape[0]

    seg_ts = ts[idx]  # (n_seg, g)
    seg_data = data[idx]  # (n_seg, g, dim)
    u0s = seg_data[:, 0, :]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        axis = mesh_axis or mesh.axis_names[0]
        seg_sh = NamedSharding(mesh, PartitionSpec(axis))
        seg_ts = jax.lax.with_sharding_constraint(seg_ts, seg_sh)
        seg_data = jax.lax.with_sharding_constraint(seg_data, seg_sh)
        u0s = jax.lax.with_sharding_constraint(u0s, seg_sh)

    def solve_segment(u0, tw):
        prob = ODEProblem(rhs, u0, (tw[0], tw[-1]), params)
        sol = solve(prob, solver, saveat=tw, rtol=rtol, atol=atol,
                    adjoint=adjoint, max_steps=max_steps)
        # error_sum (populated on the bounded-scan adjoints) is the
        # differentiable handle on "how hard was this segment to integrate"
        err = sol.error_sum if sol.error_sum is not None else jnp.zeros(())
        return sol.ys, sol.success, err

    preds, seg_ok, seg_err = jax.vmap(solve_segment)(u0s, seg_ts)

    if loss_fn is None:
        def loss_fn(pred, target, m):
            return jnp.sum(m[..., None] * (pred - target) ** 2)

    data_loss = loss_fn(preds, seg_data, mask)
    # continuity: end of segment i vs data start of segment i+1
    ends = preds[:-1, -1, :]
    starts = seg_data[1:, 0, :]
    seg_valid = mask[:-1, -1]  # only fully-covered segment ends
    continuity = jnp.sum(seg_valid[:, None] * (ends - starts) ** 2)
    # A segment that exhausts max_steps (dt underflow, stiff parameter
    # region) clamps its dense-output tail — finite but wrong values that
    # would silently enter the loss.  A large finite penalty per failed
    # segment makes line searches and LM reject the region while keeping
    # ADAM's gradients finite (the vectorized analogue of the reference's
    # try/catch around a failed shooting solve).  The flat 1e4 term is
    # piecewise constant (zero gradient), so first-order optimizers also
    # get a restoring direction from the failed segments' error_sum — the
    # differentiable sum of tolerance-normalized local error norms, which
    # shrinks as the parameters move back toward an integrable region.
    failed = jnp.where(seg_ok, 0.0, 1.0).astype(data_loss.dtype)
    restoring = jnp.sum(failed * seg_err.astype(data_loss.dtype)) / max_steps
    failure_penalty = 1e4 * jnp.sum(failed) + restoring
    return data_loss + continuity_term * continuity + failure_penalty
