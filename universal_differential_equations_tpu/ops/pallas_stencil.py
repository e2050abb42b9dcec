"""Pallas TPU kernel: fused universal-PDE right-hand side (SURVEY.md §7 M4).

The Fisher-KPP-family RHS — a pointwise reaction MLP plus a learnable 3-tap
periodic diffusion stencil (``Fisher-KPP-CNN.jl:111-126``) — is the hot op of
every universal-PDE solve: it runs once per RK stage, hundreds of times per
trajectory, millions of times per training run.

``fused_updet_rhs`` evaluates the whole thing in ONE VMEM-resident Pallas
pass: the state vector loads once from HBM, every MLP layer is an MXU matmul
on VMEM operands, the stencil is two lane-rolls fused into the same pass, and
one result writes back.  At reference scale (N=26) XLA's own fusion is
already optimal; the kernel is for production grids (N ≳ 10³) where it keeps
the (N, hidden) activations out of HBM entirely.

Shapes: N must be a multiple of 1024 (8 sublanes × 128 lanes: the state is
viewed as (8, N/8) tiles).  Weights for a pointwise MLP 1→h1→…→1 are
passed as (h_in, h_out) matrices.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_updet_rhs", "updet_rhs_xla", "make_pointwise_mlp_params"]


def make_pointwise_mlp_params(key, sizes: Sequence[int], dtype=jnp.float32):
    """Glorot-init weights for a pointwise MLP (sizes like (1, 10, 20, 10, 1))."""
    params = []
    keys = jax.random.split(key, len(sizes) - 1)
    for k, (n_in, n_out) in zip(keys, zip(sizes[:-1], sizes[1:])):
        lim = (6.0 / (n_in + n_out)) ** 0.5
        params.append((
            jax.random.uniform(k, (n_in, n_out), dtype, -lim, lim),
            jnp.zeros((n_out,), dtype),
        ))
    return params


def updet_rhs_xla(u, taps, d0, mlp_params):
    """XLA reference implementation (what the library models do)."""
    h = u[:, None]
    for i, (w, b) in enumerate(mlp_params):
        h = h @ w + b
        if i < len(mlp_params) - 1:
            h = jnp.tanh(h)
    rx = h[:, 0]
    conv = taps[0] * jnp.roll(u, 1) + taps[1] * u + taps[2] * jnp.roll(u, -1)
    return rx + d0 * conv


def _kernel(n_layers, u_ref, taps_ref, d0_ref, *refs):
    w_refs = refs[: 2 * n_layers : 2]
    b_refs = refs[1 : 2 * n_layers : 2]
    out_ref = refs[2 * n_layers]
    u = u_ref[:]  # (R, L) tile view of the row-major state
    R, L = u.shape

    # Pointwise MLP as per-channel VPU ops (Mosaic rejects the (R,L)→(N,1)
    # shape cast, and with input dimension 1 the "matmuls" are rank-1 anyway):
    # channels live as an unrolled list of (R, L) tiles held in registers.
    chans = [u]
    for i in range(n_layers):
        w = w_refs[i][:]  # (h_in, h_out)
        b = b_refs[i][:]  # (1, h_out)
        h_in = len(chans)
        h_out = w.shape[1]
        new = []
        for k in range(h_out):
            acc = b[0, k]
            for j in range(h_in):
                acc = acc + w[j, k] * chans[j]
            new.append(jnp.tanh(acc) if i < n_layers - 1 else acc)
        chans = new
    rx = chans[0]

    # Periodic 3-tap stencil on the row-major flattening without reshapes:
    # lane-roll within rows, then patch the row-boundary column with the
    # sublane-rolled version (global periodic wrap falls out of the row roll).
    col = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    lane_l = pltpu.roll(u, 1, axis=1)
    left = jnp.where(col == 0, pltpu.roll(lane_l, 1, axis=0), lane_l)
    lane_r = pltpu.roll(u, L - 1, axis=1)
    right = jnp.where(col == L - 1, pltpu.roll(lane_r, R - 1, axis=0), lane_r)
    taps = taps_ref[:]
    conv = taps[0, 0] * left + taps[0, 1] * u + taps[0, 2] * right
    out_ref[:] = rx + d0_ref[0, 0] * conv


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_updet_rhs(u, taps, d0, mlp_params, interpret=False):
    """Fused reaction+stencil RHS.  ``u``: (N,) with N % 1024 == 0;
    ``taps``: (3,); ``d0``: scalar; ``mlp_params``: list of (w, b)."""
    N = u.shape[0]
    assert N % 1024 == 0, "N must be a multiple of 1024 (8 sublanes × 128 lanes)"
    # single-block kernel: all hidden channels stay VMEM-resident.  During
    # layer k the live set is u plus the layer's input AND output channel
    # tiles, so the bound is max over layers of (1 + w_in + w_out) tiles of
    # N×4B within the ~12MB budget; larger grids need a halo-exchange grid —
    # XLA's fusion handles those sizes well already
    live_tiles = 1 + max(w.shape[0] + w.shape[1] for w, _ in mlp_params)
    assert live_tiles * N * 4 <= 12 * 2**20, (
        "N too large for the single-block kernel"
    )
    n_layers = len(mlp_params)
    u2 = u.reshape(8, N // 8)
    flat_params = []
    for w, b in mlp_params:
        flat_params.append(w)
        flat_params.append(b.reshape(1, -1))
    out = pl.pallas_call(
        functools.partial(_kernel, n_layers),
        out_shape=jax.ShapeDtypeStruct(u2.shape, u.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + 2 * n_layers),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(u2, taps.reshape(1, 3), jnp.reshape(d0, (1, 1)), *flat_params)
    return out.reshape(N)
