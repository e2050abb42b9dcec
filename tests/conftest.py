"""Test configuration: CPU backend, f64, 8-device virtual mesh.

Multi-chip sharding tests run on a virtual CPU mesh per SURVEY.md §4
("xla_force_host_platform_device_count style CPU-mesh fakes"); solver
correctness tests need native f64 (truth generation at 1e-12 tolerances,
SURVEY.md C27).  Note: the environment may rewrite JAX_PLATFORMS (a TPU
plugin prepends itself), so the platform is forced via jax.config, which
wins over the env var.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the suite is compile-dominated (measured
# 35 s -> 13 s on the heaviest adjoint test alone with a warm cache).  The
# default cache dir is fingerprinted by host CPU features + jax version
# (utils.enable_compilation_cache), so entries never leak across machines;
# tests run under x64, so their entries are disjoint from the examples'.
from universal_differential_equations_tpu.utils import (  # noqa: E402
    enable_compilation_cache as _enable_cache,
)

_enable_cache()
