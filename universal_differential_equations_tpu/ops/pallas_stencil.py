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

__all__ = ["fused_updet_rhs", "fused_updet_rhs_diff", "fused_updet_rhs_gridded",
           "updet_rhs_xla", "make_pointwise_mlp_params"]


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


_VMEM_BUDGET = 12 * 2**20  # conservative single-core VMEM working set


def _live_tiles(mlp_params):
    """Peak VMEM channel tiles: u plus layer k's input AND output channels."""
    return 1 + max(w.shape[0] + w.shape[1] for w, _ in mlp_params)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_updet_rhs(u, taps, d0, mlp_params, interpret=False):
    """Fused reaction+stencil RHS.  ``u``: (N,) with N % 1024 == 0;
    ``taps``: (3,); ``d0``: scalar; ``mlp_params``: list of (w, b).

    Dispatch: states whose full channel set fits VMEM run as one block;
    larger states route to :func:`fused_updet_rhs_gridded` (blocked grid
    with a 1-element halo per block), so there is no size cap beyond
    N % 1024 == 0.
    """
    N = u.shape[0]
    assert N % 1024 == 0, "N must be a multiple of 1024 (8 sublanes × 128 lanes)"
    if _live_tiles(mlp_params) * N * 4 > _VMEM_BUDGET:
        return fused_updet_rhs_gridded(u, taps, d0, mlp_params,
                                       interpret=interpret)
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


@functools.partial(jax.custom_jvp, nondiff_argnums=(4,))
def fused_updet_rhs_diff(u, taps, d0, mlp_params, interpret=False):
    """Differentiable fused RHS: Pallas kernel for the primal, XLA math for
    the derivatives.

    ``pallas_call``/``pltpu.roll`` carry no AD rules, so the raw kernel
    cannot sit inside a training loss.  This wrapper attaches a
    ``custom_jvp`` whose tangent rule is the JVP of the mathematically
    identical XLA lowering (:func:`updet_rhs_xla`); JAX linearizes and
    transposes that rule, so both ``jacfwd`` (ForwardSensitivity / LM
    trainers) and ``jax.grad`` / the continuous adjoints work.  The primal
    keeps the kernel's full-f32 VPU accuracy; tangents/cotangents are
    computed at XLA's precision (f32 matmul precision is pinned
    package-wide), which differs from the primal only at rounding level.
    """
    return fused_updet_rhs(u, taps, d0, mlp_params, interpret=interpret)


@fused_updet_rhs_diff.defjvp
def _fused_rhs_jvp(interpret, primals, tangents):
    out = fused_updet_rhs_diff(*primals, interpret)
    _, t_out = jax.jvp(updet_rhs_xla, primals, tangents)
    return out, t_out


def _kernel_gridded(n_layers, u_ref, halo_ref, taps_ref, d0_ref, *refs):
    """Per-block body: identical fused MLP+stencil, but the periodic wrap at
    the block corners reads the 1-element halos instead of wrapping within
    the block."""
    w_refs = refs[: 2 * n_layers : 2]
    b_refs = refs[1 : 2 * n_layers : 2]
    out_ref = refs[2 * n_layers]
    u = u_ref[:]  # (8, B/8) tile view of this block's contiguous chunk
    R, L = u.shape

    chans = [u]
    for i in range(n_layers):
        w = w_refs[i][:]
        b = b_refs[i][:]
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

    row = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    lane_l = pltpu.roll(u, 1, axis=1)
    left = jnp.where(col == 0, pltpu.roll(lane_l, 1, axis=0), lane_l)
    lane_r = pltpu.roll(u, L - 1, axis=1)
    right = jnp.where(col == L - 1, pltpu.roll(lane_r, R - 1, axis=0), lane_r)
    # block-corner patches: element 0's left neighbor and element B-1's
    # right neighbor live in the adjacent blocks.  The halo table is the
    # whole (num_blocks, 2) array in SMEM (scalar memory — Mosaic rejects
    # sub-8-row VMEM blocks), indexed by this block's grid position.
    i = pl.program_id(0)
    left = jnp.where((row == 0) & (col == 0), halo_ref[i, 0], left)
    right = jnp.where((row == R - 1) & (col == L - 1), halo_ref[i, 1], right)
    taps = taps_ref[:]
    conv = taps[0, 0] * left + taps[0, 1] * u + taps[0, 2] * right
    out_ref[:] = rx + d0_ref[0, 0] * conv


@functools.partial(jax.jit, static_argnames=("block_size", "interpret"))
def fused_updet_rhs_gridded(u, taps, d0, mlp_params, block_size=None,
                            interpret=False):
    """Blocked fused RHS for states beyond the single-block VMEM budget.

    The state is split into ``N / block_size`` contiguous blocks laid out on
    a 1-D Pallas grid; each block's 3-tap stencil needs exactly one halo
    element per side, which is gathered once on the XLA side into a
    (num_blocks, 2) array (2·num_blocks elements — negligible HBM traffic
    next to the state itself) and placed whole in SMEM, where each block
    reads its two corner scalars by grid position.
    Weights replicate across blocks.  ``block_size`` defaults to the largest
    1024-multiple divisor of N whose channel set fits VMEM.
    """
    N = u.shape[0]
    assert N % 1024 == 0, "N must be a multiple of 1024"
    live = _live_tiles(mlp_params)
    if block_size is None:
        max_block = _VMEM_BUDGET // (live * 4)
        block_size = 0
        for cand in range(1024, min(N, max_block) + 1, 1024):
            if N % cand == 0:
                block_size = cand
        assert block_size, (
            f"no 1024-multiple divisor of N={N} fits the VMEM budget "
            f"({live} live channel tiles)")
    B = block_size
    assert N % B == 0 and B % 1024 == 0
    nb = N // B

    starts = jnp.arange(nb) * B
    halo = jnp.stack([u[(starts - 1) % N], u[(starts + B) % N]], axis=1)

    n_layers = len(mlp_params)
    u2 = u.reshape(nb * 8, B // 8)  # rows 8i..8i+7 = block i, contiguous
    flat_params, param_specs = [], []
    for w, b in mlp_params:
        flat_params.append(w)
        flat_params.append(b.reshape(1, -1))
    for p in flat_params:
        param_specs.append(
            pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_kernel_gridded, n_layers),
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct(u2.shape, u.dtype),
        in_specs=[
            pl.BlockSpec((8, B // 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + param_specs,
        out_specs=pl.BlockSpec((8, B // 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(u2, halo, taps.reshape(1, 3), jnp.reshape(d0, (1, 1)), *flat_params)
    return out.reshape(N)
