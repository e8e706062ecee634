"""I/O round-trip tests (VTU structure + MatrixMarket)."""

import numpy as np
import xml.etree.ElementTree as ET

from mfmg_tpu.amge.agglomeration import build_agglomerates
from mfmg_tpu.config import AgglomerationConfig
from mfmg_tpu.fem.laplace import LaplaceProblem
from mfmg_tpu.fem.mesh import hyper_ball, hyper_cube
from mfmg_tpu.utils.io import (output_agglomerates, write_matrix_market,
                               write_vector_matrix_market, write_vtu)


def test_vtu_valid_xml(tmp_path):
    for mesh in (hyper_cube(2, 2), hyper_cube(3, 1, degree=2), hyper_ball(2, 1)):
        fn = tmp_path / "out.vtu"
        u = np.linspace(0, 1, mesh.n_nodes)
        write_vtu(str(fn), mesh, point_data={"u": u})
        root = ET.parse(fn).getroot()
        piece = root.find(".//Piece")
        assert int(piece.get("NumberOfPoints")) == mesh.n_nodes
        assert int(piece.get("NumberOfCells")) == mesh.n_cells


def test_agglomerate_output(tmp_path):
    prob = LaplaceProblem.hyper_cube(2, 3)
    agg = build_agglomerates(prob.mesh, AgglomerationConfig(nx=2, ny=2))
    fn = tmp_path / "agg.vtu"
    output_agglomerates(str(fn), prob.mesh, agg)
    txt = fn.read_text()
    assert "agglomerates" in txt


def test_matrix_market_roundtrip(tmp_path):
    from scipy.io import mmread
    prob = LaplaceProblem.hyper_cube(2, 2)
    fn = tmp_path / "A.mtx"
    write_matrix_market(str(fn), prob.A)
    B = mmread(str(fn)).tocsr()
    assert abs(prob.A - B).max() < 1e-14
    write_vector_matrix_market(str(tmp_path / "v.mtx"), prob.diag_raw)
