from .runge_kutta import AbstractERK, Bosh3, Dopri5, Euler, Heun, Tsit5, Vern7
from .rkc import RKC1, RKC2
from .tableaus import ButcherTableau, TABLEAUS
