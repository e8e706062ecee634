from mfmg_tpu.ops.sparse import ELLMatrix, ell_from_scipy, eliminate_dirichlet
from mfmg_tpu.ops.local_apply import MatrixFreeOperator

__all__ = ["ELLMatrix", "ell_from_scipy", "eliminate_dirichlet", "MatrixFreeOperator"]
