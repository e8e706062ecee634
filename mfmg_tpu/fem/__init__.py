from mfmg_tpu.fem.reference import ReferenceElement
from mfmg_tpu.fem.mesh import Mesh
from mfmg_tpu.fem.laplace import LaplaceProblem
from mfmg_tpu.fem import coefficients

__all__ = ["ReferenceElement", "Mesh", "LaplaceProblem", "coefficients"]
