"""Neural layers for embedding in differential-equation right-hand sides.

TPU-native replacement for the reference's three NN stacks (SURVEY.md C12):
``Lux.Chain/Dense`` with explicit param separation (``scenario_1.jl:59-66``),
``FastChain/FastDense`` flat-parameter nets (``hudson_bay.jl:77-82``) and Flux
chains (``Fisher-KPP-CNN.jl:92-96``).  Layers are static module objects;
parameters are pytrees created by ``init(key)`` and passed explicitly to
``apply`` — the Lux discipline, which is also exactly the JAX discipline.

Everything is shape-static and compiles to MXU matmuls; activations fuse into
them under XLA.  ``flat_init``/``make_apply_flat`` give the FastChain-style
flat-vector view needed by BFGS and ComponentVector-style training
(``hudson_bay.jl:82``, C13).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

__all__ = [
    "rbf",
    "gaussian_rbf",
    "Dense",
    "Chain",
    "MLP",
    "StencilConv1D",
    "FourierBasis",
    "TensorLayer",
]


def rbf(x):
    """Gaussian radial basis activation ``exp(-x^2)`` (``scenario_1.jl:59``)."""
    return jnp.exp(-(x * x))


gaussian_rbf = rbf

_ACTIVATIONS = {
    "rbf": rbf,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "swish": jax.nn.swish,
    "gelu": jax.nn.gelu,
    "identity": lambda x: x,
}


def _resolve(act):
    if callable(act):
        return act
    return _ACTIVATIONS[act]


@dataclasses.dataclass(frozen=True)
class Dense:
    """Affine layer ``W x + b`` with optional activation.

    Glorot-uniform weight init (Lux's default, matching the reference's
    training behavior).
    """

    in_size: int
    out_size: int
    activation: object = "identity"
    use_bias: bool = True

    def init(self, key, dtype=jnp.float32):
        wkey, _ = jax.random.split(key)
        lim = math.sqrt(6.0 / (self.in_size + self.out_size))
        w = jax.random.uniform(
            wkey, (self.out_size, self.in_size), dtype, -lim, lim
        )
        params = {"w": w}
        if self.use_bias:
            params["b"] = jnp.zeros((self.out_size,), dtype)
        return params

    def apply(self, params, x):
        y = params["w"] @ x if x.ndim == 1 else x @ params["w"].T
        if self.use_bias:
            y = y + params["b"]
        return _resolve(self.activation)(y)


@dataclasses.dataclass(frozen=True)
class Chain:
    """Sequential composition of layers (``Lux.Chain``)."""

    layers: Tuple

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, len(self.layers))
        return [l.init(k, dtype) for l, k in zip(self.layers, keys)]

    def apply(self, params, x):
        for layer, p in zip(self.layers, params):
            x = layer.apply(p, x)
        return x

    def __call__(self, params, x):
        return self.apply(params, x)

    # FastChain-style flat-parameter view (C13)
    def flat_init(self, key):
        params = self.init(key)
        flat, unravel = ravel_pytree(params)
        return flat, unravel

    def make_apply_flat(self, key):
        _, unravel = self.flat_init(key)

        def apply_flat(theta, x):
            return self.apply(unravel(theta), x)

        return apply_flat

    def as_matmul_params(self, params):
        """Dense-chain params as a ``[(w, b), ...]`` list of (h_in, h_out)
        matmul weights — the layout consumed by the fused Pallas RHS kernel
        (:func:`..ops.pallas_stencil.fused_updet_rhs`, which hard-codes the
        tanh hidden activation this chain must be using)."""
        out = []
        for layer, p in zip(self.layers, params):
            assert isinstance(layer, Dense), "matmul view needs a Dense chain"
            b = p.get("b")
            if b is None:
                b = jnp.zeros((layer.out_size,), p["w"].dtype)
            out.append((p["w"].T, b))
        return out


def MLP(sizes: Sequence[int], activation="rbf", final_activation="identity"):
    """Multi-layer perceptron, e.g. ``MLP([2, 5, 5, 5, 2])`` is the
    reference's scenario-1 net (``scenario_1.jl:60-64``)."""
    layers = []
    for i in range(len(sizes) - 1):
        act = activation if i < len(sizes) - 2 else final_activation
        layers.append(Dense(sizes[i], sizes[i + 1], act))
    return Chain(tuple(layers))


@dataclasses.dataclass(frozen=True)
class StencilConv1D:
    """Learnable k-tap 1-D convolution stencil with periodic wrap.

    The reference's "CNN": an explicit 3-tap periodic stencil for learned
    diffusion (``Fisher-KPP-CNN.jl:111-126``, ``scenario_3.jl:104-110``, C14).
    Implemented with ``jnp.roll`` shifts, which XLA fuses into one
    vectorized gather-free pass.
    """

    taps: int = 3

    def init(self, key, dtype=jnp.float32):
        # centered difference-like init, small and zero-sum-ish
        w = jax.random.normal(key, (self.taps,), dtype) * 0.1
        return {"w": w}

    def apply(self, params, x):
        w = params["w"]
        half = self.taps // 2
        out = jnp.zeros_like(x)
        for i in range(self.taps):
            out = out + w[i] * jnp.roll(x, half - i, axis=-1)
        return out

    def __call__(self, params, x):
        return self.apply(params, x)


@dataclasses.dataclass(frozen=True)
class FourierBasis:
    """Fourier feature basis on [-1, 1]-scaled input (``DiffEqFlux.FourierBasis``).

    ``n`` basis functions: sin(k·x) for k=1..⌈n/2⌉ and cos(k·x) for the rest
    (``Fisher-KPP-CNN-Fourier.jl:89-92``).  With ``include_constant=True`` the
    first function is 1 — pure trig bases cannot represent functions with a
    free constant (e.g. the logistic reaction u−u²), which silently floors
    the Fisher-KPP fit.
    """

    n: int
    include_constant: bool = False

    def __call__(self, x):
        n_trig = self.n - int(self.include_constant)
        ks = jnp.arange(1, n_trig // 2 + n_trig % 2 + 1, dtype=x.dtype)
        sins = jnp.sin(ks * x[..., None])
        kc = jnp.arange(1, n_trig // 2 + 1, dtype=x.dtype)
        coss = jnp.cos(kc * x[..., None])
        parts = [sins, coss]
        if self.include_constant:
            parts.insert(0, jnp.ones_like(x[..., None]))
        return jnp.concatenate(parts, axis=-1)


@dataclasses.dataclass(frozen=True)
class TensorLayer:
    """Linear combination of a tensor product of basis functions.

    ``TensorLayer([FourierBasis(n)], 1)`` of the reference
    (``Fisher-KPP-CNN-Fourier.jl:91-92``): output ``w · B(x)``.
    """

    bases: Tuple
    out_size: int = 1

    @property
    def num_features(self):
        n = 1
        for b in self.bases:
            n *= b.n
        return n

    def init(self, key, dtype=jnp.float32):
        return {"w": jax.random.normal(key, (self.out_size, self.num_features),
                                       dtype) * 0.1}

    def apply(self, params, x):
        # x: (len(bases),) scalar inputs per basis; tensor-product features
        feats = None
        for i, b in enumerate(self.bases):
            fi = b(x[i]) if x.ndim else b(x)
            feats = fi if feats is None else jnp.outer(feats, fi).ravel()
        return params["w"] @ feats

    def __call__(self, params, x):
        return self.apply(params, x)
