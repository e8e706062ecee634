"""Per-cell geometry factors at quadrature points.

Computes what deal.II's FEValues/MatrixFree mapping data provides (Jacobians,
JxW, physical quadrature points; reference tests/laplace.hpp:160-195 and
laplace_matrix_free.hpp:129-156 consume exactly these), batched over all cells
as dense arrays — the TPU-native replacement for per-cell FEValues::reinit.

All computation is numpy float64 at setup time; the results feed both host CSR
assembly and the device matrix-free apply.
"""

from __future__ import annotations

import dataclasses
import numpy as np

from mfmg_tpu.fem.mesh import Mesh
from mfmg_tpu.fem.reference import reference_element


@dataclasses.dataclass
class GeometryFactors:
    """Batched mapping data.

    G : (n_cells, n_q, dim, n_loc) physical-space shape gradients
        G[c,q,d,i] = d(phi_i)/d(x_d) at quadrature point q of cell c.
    JxW : (n_cells, n_q) quadrature weight times |det J|.
    qpoints_phys : (n_cells, n_q, dim) physical quadrature points.
    """

    G: np.ndarray
    JxW: np.ndarray
    qpoints_phys: np.ndarray


def compute_geometry(mesh: Mesh) -> GeometryFactors:
    ref = reference_element(mesh.dim, mesh.degree)
    xe = mesh.nodes[mesh.cells]                  # (n_cells, n_loc, dim)
    # Jacobian J[c,q,a,b] = d x_a / d xhat_b = sum_i xe[c,i,a] * D[q,b,i]
    J = np.einsum("cia,qbi->cqab", xe, ref.D)
    detJ = np.linalg.det(J)
    if np.any(detJ <= 0):
        raise ValueError("mesh contains inverted/degenerate cells (det J <= 0)")
    Jinv = np.linalg.inv(J)                      # (c,q,a,b) = d xhat_a / d x_b
    # physical gradient: dphi/dx_d = sum_b Jinv[c,q,b,d] * D[q,b,i]
    G = np.einsum("cqbd,qbi->cqdi", Jinv, ref.D)
    JxW = ref.qweights[None, :] * detJ
    qpoints_phys = np.einsum("cia,qi->cqa", xe, ref.N)
    return GeometryFactors(G=G, JxW=JxW, qpoints_phys=qpoints_phys)


def local_stiffness_matrices(mesh: Mesh, geom: GeometryFactors,
                             coeff_at_q: np.ndarray) -> np.ndarray:
    """Batched variable-coefficient Laplace cell matrices.

    A_loc[c,i,j] = sum_q JxW[c,q] * coeff[c,q] * grad(phi_i) . grad(phi_j)
    (the bilinear form of reference tests/laplace.hpp:186-191).
    Returns (n_cells, n_loc, n_loc) float64.
    """
    s = geom.JxW * coeff_at_q                    # (c, q)
    return np.einsum("cqdi,cq,cqdj->cij", geom.G, s, geom.G, optimize=True)


def local_mass_rhs(mesh: Mesh, geom: GeometryFactors, f_at_q: np.ndarray) -> np.ndarray:
    """Cell load vectors rhs_loc[c,i] = sum_q JxW * f * phi_i (laplace.hpp:192-193)."""
    ref = reference_element(mesh.dim, mesh.degree)
    return np.einsum("cq,qi->ci", geom.JxW * f_at_q, ref.N)
