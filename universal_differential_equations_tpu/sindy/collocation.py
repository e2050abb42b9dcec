"""Kernel collocation: derivative estimation from noisy trajectories (C20).

The reference forms (X, DX) pairs without solving anything via
``ContinuousDataDrivenProblem(Xₙ, t, GaussianKernel())`` (``hudson_bay.jl:48``).
Implementation: local linear (weighted) regression at every sample time — the
smoothed state is the local intercept, the derivative the local slope.  Fully
vectorized: the whole (N×N) weight matrix and both moment contractions are a
few fused matmuls on the MXU.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["collocate_data"]

_KERNELS = {
    "gaussian": lambda r: jnp.exp(-0.5 * r * r),
    "epanechnikov": lambda r: jnp.maximum(1.0 - r * r, 0.0),
    "triangular": lambda r: jnp.maximum(1.0 - jnp.abs(r), 0.0),
}


def collocate_data(X, t, kernel: str = "gaussian", bandwidth=None):
    """Estimate smoothed states and derivatives from samples.

    Args:
      X: (N, n) noisy samples at times ``t`` (N,).
      kernel: 'gaussian' | 'epanechnikov' | 'triangular'.
      bandwidth: kernel width in time units; default is four median sample
        spacings — wide enough to average noise, narrow enough to keep the
        local-linear bias ~O(h²·x'') small.

    Returns:
      (X_smooth, DX): both (N, n).
    """
    X = jnp.asarray(X)
    t = jnp.asarray(t, X.dtype)
    N = t.shape[0]
    if bandwidth is None:
        # stays a traced scalar so collocate_data works under jit/vmap
        bandwidth = 4.0 * jnp.median(jnp.diff(t))
    K = _KERNELS[kernel]

    dt = t[None, :] - t[:, None]  # dt[i, j] = t_j - t_i
    W = K(dt / bandwidth)  # (N, N)

    S0 = W.sum(axis=1)  # (N,)
    S1 = (W * dt).sum(axis=1)
    S2 = (W * dt * dt).sum(axis=1)
    T0 = W @ X  # (N, n)
    T1 = (W * dt) @ X

    det = S0 * S2 - S1 * S1
    det = jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    a = (S2[:, None] * T0 - S1[:, None] * T1) / det[:, None]  # intercept
    b = (S0[:, None] * T1 - S1[:, None] * T0) / det[:, None]  # slope
    return a, b
