"""Variable-coefficient Laplace problem: -div(c(x) grad u) = f, u=0 on boundary.

The canonical problem family of the reference test suite
(reference tests/laplace.hpp:43-292 matrix path, tests/laplace_matrix_free.hpp
matrix-free path).  One object provides both representations of the same
operator — assembled ELL/CSR and matrix-free — plus the raw diagonal used for
the AMGe partition-of-unity weights.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from mfmg_tpu.fem import coefficients as coeff_mod
from mfmg_tpu.fem.geometry import GeometryFactors, compute_geometry, local_mass_rhs, local_stiffness_matrices
from mfmg_tpu.fem.mesh import Mesh, hyper_cube
from mfmg_tpu.ops.local_apply import MatrixFreeOperator
from mfmg_tpu.ops.sparse import ELLMatrix, assemble_csr, eliminate_dirichlet, ell_from_scipy


@dataclasses.dataclass
class LaplaceProblem:
    mesh: Mesh
    coefficient: Callable
    geom: GeometryFactors = None
    A_loc: np.ndarray = None          # (n_cells, n_loc, n_loc) cell matrices
    diag_raw: np.ndarray = None       # raw (Neumann-assembled) global diagonal
    coeff_at_q: np.ndarray = None
    # Global CSR matrices are assembled LAZILY: the matrix-free setup path
    # (operator stencil/matrix_free/sumfac + fast AP) never touches them, so
    # peak memory stays O(cells * n_loc^2) — the reference's matrix-free
    # hierarchy likewise never forms global A
    # (dealii_matrix_free_hierarchy_helpers.cc:55-303).
    _A_raw: sp.csr_matrix = dataclasses.field(default=None, repr=False)
    _A: sp.csr_matrix = dataclasses.field(default=None, repr=False)

    @property
    def A_raw(self) -> sp.csr_matrix:
        """Assembled matrix, no constraints (lazy)."""
        if self._A_raw is None:
            self._A_raw = assemble_csr(self.mesh.cells, self.A_loc, self.mesh.n_nodes)
        return self._A_raw

    @property
    def A(self) -> sp.csr_matrix:
        """Assembled, condensed (hanging-node) and Dirichlet-eliminated matrix
        (lazy).  On adaptive meshes this is C^T A C in the AffineConstraints
        sense (reference tests/laplace.hpp:126-141,197-199)."""
        if self._A is None:
            A = self.A_raw
            if self.mesh.hanging is not None:
                A = self.mesh.hanging.condense(A)
            self._A = eliminate_dirichlet(A, self.mesh.constrained_mask)
        return self._A

    @staticmethod
    def hyper_cube(dim: int, n_refinements: int, degree: int = 1,
                   material_property: str | Callable = "constant",
                   distort_random: bool = False, seed: int = 0) -> "LaplaceProblem":
        """Problem on the unit hyper_cube (reference tests/laplace.hpp:88-111)."""
        mesh = hyper_cube(dim, n_refinements, degree=degree,
                          distort_random=distort_random, seed=seed)
        return LaplaceProblem.from_mesh(mesh, material_property)

    @staticmethod
    def from_mesh(mesh: Mesh, material_property: str | Callable = "constant",
                  local_matrix_fn: Callable | None = None) -> "LaplaceProblem":
        """Build a problem on any mesh.

        local_matrix_fn(mesh, geom, coeff_at_q) -> (n_cells, n_loc, n_loc)
        overrides the Laplace bilinear form — the hook for user-defined
        operators (the analog of implementing a custom MeshEvaluator:
        everything downstream — AMGe setup, stencil extraction, hierarchy —
        consumes only the cell matrices)."""
        coefficient = (coeff_mod.get(material_property)
                       if isinstance(material_property, str) else material_property)
        prob = LaplaceProblem(mesh=mesh, coefficient=coefficient)
        prob._setup(local_matrix_fn)
        return prob

    def _setup(self, local_matrix_fn=None):
        self.geom = compute_geometry(self.mesh)
        self.coeff_at_q = self.coefficient(self.geom.qpoints_phys)
        fn = local_matrix_fn or local_stiffness_matrices
        self.A_loc = fn(self.mesh, self.geom, self.coeff_at_q)
        # raw global diagonal straight from the cell matrices (no assembly)
        d_loc = np.einsum("cii->ci", self.A_loc)
        self.diag_raw = np.bincount(self.mesh.cells.reshape(-1),
                                    weights=d_loc.reshape(-1),
                                    minlength=self.mesh.n_nodes)

    # -- operator representations ------------------------------------------
    @property
    def n_dofs(self) -> int:
        return self.mesh.n_nodes

    @property
    def constrained(self) -> np.ndarray:
        return self.mesh.constrained_mask

    def distribute(self, u: np.ndarray) -> np.ndarray:
        """Recover hanging-slave values from their masters after a solve
        (AffineConstraints::distribute; no-op on conforming meshes)."""
        if self.mesh.hanging is None:
            return u
        return self.mesh.hanging.distribute(u)

    def ell_operator(self, dtype=jnp.float64) -> ELLMatrix:
        """Assembled-path operator (analog of DealIITrilinosMatrixOperator /
        SparseMatrixDevice)."""
        return ell_from_scipy(self.A, dtype=dtype)

    def matrix_free_operator(self, dtype=jnp.float64, mode: str = "local_matrix") -> MatrixFreeOperator:
        """Matrix-free operator (analog of DealIIMatrixFreeOperator vmult via
        the user's matrix_free_evaluate_global).

        Hanging-node meshes apply the condensed C^T A C cell-wise (the
        reference's MatrixFree + AffineConstraints path,
        tests/laplace.hpp:126-141): see ops/local_apply.py.
        """
        hc_kw = {}
        if self.mesh.hanging is not None:
            h = self.mesh.hanging
            # condensed-operator diagonal (master rows pick up w A w
            # corrections); one host extraction at setup from the lazily
            # assembled condensed matrix — the APPLY stays cell-wise
            hc_kw = dict(
                hc_slaves=jnp.asarray(h.slaves, dtype=jnp.int32),
                hc_masters=jnp.asarray(
                    np.where(np.arange(h.masters.shape[1])[None]
                             < h.n_masters[:, None], h.masters, 0),
                    dtype=jnp.int32),
                hc_weights=jnp.asarray(
                    np.where(np.arange(h.masters.shape[1])[None]
                             < h.n_masters[:, None], h.weights, 0.0),
                    dtype=dtype),
                diag_all=jnp.asarray(np.asarray(self.A.diagonal()), dtype=dtype),
            )
        if mode == "local_matrix":
            return MatrixFreeOperator(
                cells=jnp.asarray(self.mesh.cells),
                constrained=jnp.asarray(self.mesh.boundary_dofs),
                diag=jnp.asarray(self.diag_raw, dtype=dtype),
                A_loc=jnp.asarray(self.A_loc, dtype=dtype),
                **hc_kw,
            )
        elif mode == "quadrature":
            return MatrixFreeOperator(
                cells=jnp.asarray(self.mesh.cells),
                constrained=jnp.asarray(self.mesh.boundary_dofs),
                diag=jnp.asarray(self.diag_raw, dtype=dtype),
                G=jnp.asarray(self.geom.G, dtype=dtype),
                scale=jnp.asarray(self.geom.JxW * self.coeff_at_q, dtype=dtype),
                **hc_kw,
            )
        elif mode == "sumfac":
            from mfmg_tpu.ops.sumfac import build_sumfac_operator
            return build_sumfac_operator(self.mesh, self.coeff_at_q,
                                         self.diag_raw, self.A_loc, dtype=dtype)
        raise ValueError(f"unknown matrix-free mode {mode!r}")

    # -- rhs / error -------------------------------------------------------
    def assemble_rhs(self, source: Callable) -> np.ndarray:
        """Load vector for a source term; zero at Dirichlet dofs."""
        f_at_q = source(self.geom.qpoints_phys)
        rhs_loc = local_mass_rhs(self.mesh, self.geom, f_at_q)
        rhs = np.zeros(self.n_dofs)
        np.add.at(rhs, self.mesh.cells.reshape(-1), rhs_loc.reshape(-1))
        if self.mesh.hanging is not None:
            # condensed load: b <- C^T b (slave load redistributed to masters)
            rhs = self.mesh.hanging.matrix(self.n_dofs).T @ rhs
        rhs[self.mesh.constrained_mask] = 0.0
        return rhs

    def l2_error(self, u: np.ndarray, exact: Callable) -> float:
        """L2 norm of (u_h - exact) via the quadrature rule
        (analog of dealii::VectorTools::integrate_difference, laplace.hpp:227-243)."""
        from mfmg_tpu.fem.reference import reference_element
        ref = reference_element(self.mesh.dim, self.mesh.degree)
        u_loc = u[self.mesh.cells]                       # (c, nl)
        u_at_q = np.einsum("qi,ci->cq", ref.N, u_loc)
        diff = u_at_q - exact(self.geom.qpoints_phys)
        return float(np.sqrt(np.sum(self.geom.JxW * diff**2)))
