"""universal_differential_equations_tpu — TPU-native universal differential equations.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
Universal Differential Equations reference (arXiv:2001.04385): adaptive
ODE/SDE/DAE solvers with neural-network right-hand sides, forward and
continuous-adjoint sensitivity, SINDy sparse regression, method-of-lines
universal PDEs, deep-BSDE solvers, and sharded trajectory ensembles.
See SURVEY.md for the capability map (C1-C29).
"""

import jax as _jax

# Scientific-computing default: full-f32 matmuls.  On TPU, XLA routes f32
# matmuls through the MXU with bfloat16 inputs by default; for the tiny
# networks embedded in differential equations this silently caps trajectory
# fits at ~1e-4 (measured: forcing f32 drops ensemble training losses from
# 1.2e-4 to 4e-6 median — 28x).  The MXU speed this sacrifices is irrelevant
# at these model sizes.  Override after import if large-matmul throughput
# matters: jax.config.update("jax_default_matmul_precision", "bfloat16").
_jax.config.update("jax_default_matmul_precision", "float32")

from .api import solve
from .core.problem import DAEProblem, ODEProblem, SDEProblem, remake
from .core.solution import DenseInterpolation, Solution
from .core.controller import PIController
from .solvers.runge_kutta import Bosh3, Dopri5, Euler, Heun, Tsit5, Vern7
from .solvers.rkc import RKC1, RKC2
from .solvers.rock import ROCK2, ROCK4
from .solvers.rosenbrock import Rosenbrock23
from .solvers.sdirk import SDIRK3
from .solvers.esdirk import Kvaerno3, SDIRK4
from .solvers.bdf import daeint, initialize_dae
from .solvers.sde import AdaptiveEM, EulerHeun, EulerMaruyama, sdeint
from .adjoint.sensitivity import (
    BacksolveAdjoint,
    DiscreteAdjoint,
    ForwardSensitivity,
    InterpolatingAdjoint,
    NoAdjoint,
    QuadratureAdjoint,
)

from .nn.layers import (
    Chain, Dense, FourierBasis, MLP, StencilConv1D, TensorLayer, rbf,
)
from .train.fit import FitResult, fit, fit_bfgs, reduce_on_plateau
from .train.bfgs import bfgs_minimize
from .train.lm import levenberg_marquardt
from .train.shooting import multiple_shoot, shooting_windows
from .io.checkpoint import BestCheckpoint, KeyedArchive, load_pytree, save_pytree
from .models.neural_ode import NeuralODE, neural_ode

__version__ = "0.1.0"
__all__ = [
    "solve", "remake",
    "ODEProblem", "SDEProblem", "DAEProblem",
    "Solution", "DenseInterpolation", "PIController",
    "Tsit5", "Vern7", "Dopri5", "Bosh3", "Euler", "Heun", "RKC1", "RKC2",
    "ROCK2", "ROCK4",
    "Rosenbrock23", "SDIRK3", "Kvaerno3", "SDIRK4", "daeint", "initialize_dae",
    "sdeint", "EulerMaruyama", "EulerHeun", "AdaptiveEM",
    "NoAdjoint", "DiscreteAdjoint", "ForwardSensitivity",
    "InterpolatingAdjoint", "BacksolveAdjoint", "QuadratureAdjoint",
    "Chain", "Dense", "MLP", "FourierBasis", "StencilConv1D", "TensorLayer",
    "rbf",
    "fit", "fit_bfgs", "FitResult", "reduce_on_plateau", "bfgs_minimize",
    "levenberg_marquardt", "multiple_shoot", "shooting_windows",
    "BestCheckpoint", "KeyedArchive", "save_pytree", "load_pytree",
    "NeuralODE", "neural_ode",
]
