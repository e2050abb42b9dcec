from .problem import DAEProblem, ODEProblem, SDEProblem, remake
from .solution import DenseInterpolation, Solution
from .controller import PIController
