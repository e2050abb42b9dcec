from .runge_kutta import AbstractERK, Bosh3, Dopri5, Euler, Heun, Tsit5, Vern7
from .rkc import RKC1, RKC2
from .rock import ROCK2, ROCK4
from .rosenbrock import Rosenbrock23
from .sdirk import SDIRK3
from .esdirk import Kvaerno3, SDIRK4
from .bdf import daeint, initialize_dae
from .sde import AdaptiveEM, EulerHeun, EulerMaruyama, SDESolution, sdeint
from .tableaus import ButcherTableau, TABLEAUS
