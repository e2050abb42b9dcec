from .solver import BSDEResult, NNPDENS, TerminalPDEProblem, mc_analytical_hjb, solve_terminal_pde
