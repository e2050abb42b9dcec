from .bfgs import BFGSResult, bfgs_minimize
from .fit import FitResult, fit, fit_bfgs, reduce_on_plateau
from .lm import LMResult, levenberg_marquardt
from .shooting import multiple_shoot, shooting_windows
