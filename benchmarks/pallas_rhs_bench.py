"""Pallas fused universal-PDE RHS vs XLA lowering: speed AND accuracy.

Substantiates the `ops/` claims on the real TPU: at production grid sizes
the one-VMEM-pass kernel (reaction MLP + periodic 3-tap stencil,
`Fisher-KPP-CNN.jl:111-126` role) is compared against XLA's own lowering of
the identical computation for (a) wall-clock per evaluation and (b) f32
accuracy versus a float64 host reference (XLA lowers small f32 matmuls to
bf16 MXU passes unless told otherwise; the kernel does full-f32 VPU math).

Prints one JSON line per grid size:
  {"n": N, "pallas_us": ..., "xla_us": ..., "speed_ratio": ...,
   "pallas_relerr": ..., "xla_relerr": ...}

Run on a TPU host: python benchmarks/pallas_rhs_bench.py [--sizes 1024,8192]
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from universal_differential_equations_tpu.ops import (
    fused_updet_rhs,
    make_pointwise_mlp_params,
    updet_rhs_xla,
)
from universal_differential_equations_tpu.utils import (
    benchmark,
    enable_compilation_cache,
)


_CHAIN = 4000  # RHS evals per device program — the per-dispatch round trip
# on a tunneled TPU is ~25 ms, so per-eval time is (t_chain − t_null)/CHAIN
# with t_null the measured empty-dispatch baseline; this matches how the op
# is actually used (hundreds of evals inside one compiled solver program)


def _time(rhs_fn, u, t_null, repeats=10):
    """Seconds per RHS eval: chain _CHAIN dependent evals in one program."""

    def chained(u0):
        return jax.lax.fori_loop(0, _CHAIN, lambda i, v: rhs_fn(v), u0)

    stats = benchmark(chained, u, repeats=repeats, warmup=2)
    return max(stats["min_s"] - t_null, 1e-12) / _CHAIN, rhs_fn(u)


def _null_dispatch(u, repeats=20):
    """Round-trip cost of launching a near-empty program on this device."""
    stats = benchmark(lambda x: x + 1.0, u, repeats=repeats, warmup=2)
    return stats["min_s"]


def _f64_reference(u, taps, d0, mlp):
    to64 = lambda x: np.asarray(x, np.float64)
    h = to64(u)[:, None]
    for i, (w, b) in enumerate(mlp):
        h = h @ to64(w) + to64(b)
        if i < len(mlp) - 1:
            h = np.tanh(h)
    rx = h[:, 0]
    t = to64(taps)
    conv = t[0] * np.roll(to64(u), 1) + t[1] * to64(u) + t[2] * np.roll(to64(u), -1)
    return rx + float(d0) * conv


def measure(n, key=None):
    """Speed + accuracy comparison at grid size ``n`` (also consumed by
    run_all.py row 11)."""
    key = jax.random.PRNGKey(0) if key is None else key
    taps = jnp.array([6.25, -12.5, 6.25], jnp.float32)
    d0 = jnp.float32(1.0)
    mlp = make_pointwise_mlp_params(key, (1, 10, 20, 10, 1))

    u = jax.random.uniform(jax.random.fold_in(key, n), (n,), jnp.float32)
    pal = jax.jit(lambda uu: fused_updet_rhs(uu, taps, d0, mlp))
    # "default" XLA path: exactly what a model author would write; use
    # default matmul precision to expose the bf16 MXU lowering the
    # package guards against (the package __init__ pins f32 — the bench
    # measures what happens without the guard)
    t_null = _null_dispatch(u)
    with jax.default_matmul_precision("bfloat16"):
        xla = jax.jit(lambda uu: updet_rhs_xla(uu, taps, d0, mlp))
        t_x, out_x = _time(xla, u, t_null)
    with jax.default_matmul_precision("float32"):
        xla32 = jax.jit(lambda uu: updet_rhs_xla(uu, taps, d0, mlp))
        t_x32, out_x32 = _time(xla32, u, t_null)
    t_p, out_p = _time(pal, u, t_null)
    ref = _f64_reference(u, taps, d0, mlp)
    scale = np.abs(ref).max()
    err_p = float(np.abs(np.asarray(out_p, np.float64) - ref).max() / scale)
    err_x = float(np.abs(np.asarray(out_x, np.float64) - ref).max() / scale)
    err_x32 = float(np.abs(np.asarray(out_x32, np.float64) - ref).max() / scale)
    return {
        "n": n,
        "pallas_us": round(t_p * 1e6, 2),
        "xla_bf16_us": round(t_x * 1e6, 2),
        "xla_f32_us": round(t_x32 * 1e6, 2),
        "vs_bf16_speed": round(t_x / t_p, 2),
        "vs_f32_speed": round(t_x32 / t_p, 2),
        "pallas_relerr": float(f"{err_p:.3g}"),
        "xla_bf16_relerr": float(f"{err_x:.3g}"),
        "xla_f32_relerr": float(f"{err_x32:.3g}"),
    }


def main():
    ap = argparse.ArgumentParser()
    # 262144 and 1048576 exceed the single-block VMEM budget and route
    # through the gridded halo-exchange kernel (fused_updet_rhs dispatches)
    ap.add_argument("--sizes", default="1024,8192,65536,262144,1048576")
    args = ap.parse_args()
    enable_compilation_cache()
    for n in (int(s) for s in args.sizes.split(",")):
        print(json.dumps(measure(n)))


if __name__ == "__main__":
    main()
