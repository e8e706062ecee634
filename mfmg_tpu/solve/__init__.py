from mfmg_tpu.solve.smoothers import JacobiSmoother, ChebyshevSmoother, build_smoother
from mfmg_tpu.solve.coarse import DirectCoarseSolver, build_coarse_solver
from mfmg_tpu.solve.cg import cg_solve

__all__ = [
    "JacobiSmoother",
    "ChebyshevSmoother",
    "build_smoother",
    "DirectCoarseSolver",
    "build_coarse_solver",
    "cg_solve",
]
