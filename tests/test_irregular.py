"""Irregular (non-box) meshes: uneven node degrees, spill-heavy span
plans, general incidence widths — every accumulate mode must agree with
the scalar oracle end to end."""
import copy

import numpy as np
import pytest

import oracle
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.core.constants import MeshVariant
from mgcfd_tpu.core.types import MeshLevel, MultigridMesh
from mgcfd_tpu.mesh import generate_box_mesh
from mgcfd_tpu.mesh.build import apply_ewt_conditioning
from mgcfd_tpu.solver import MGCFDSolver


def irregular_mesh(seed=0):
    """Box mesh mutated into an irregular graph: drop 15% of internal
    edges, add 10% random long-range edges with small normals."""
    lvl = generate_box_mesh(6, 6, 6, h=(0.1, 0.1, 0.1), volume_jitter=0.2,
                            seed=seed)
    rng = np.random.default_rng(seed + 100)
    ei = lvl.num_internal_edges
    keep = rng.random(ei) > 0.15
    edge_a, edge_b, edge_w = (lvl.edge_a[keep], lvl.edge_b[keep],
                              lvl.edge_w[keep])
    n_extra = ei // 10
    xa = rng.integers(0, lvl.num_nodes, n_extra)
    xb = rng.integers(0, lvl.num_nodes, n_extra)
    ok = xa != xb
    xa, xb = xa[ok], xb[ok]
    lo = np.minimum(xa, xb).astype(np.int32)
    hi = np.maximum(xa, xb).astype(np.int32)
    xw = rng.standard_normal((lo.size, 3)) * 0.002
    lvl2 = MeshLevel(
        volumes=lvl.volumes, coords=lvl.coords,
        edge_a=np.concatenate([edge_a, lo]),
        edge_b=np.concatenate([edge_b, hi]),
        edge_w=np.concatenate([edge_w, xw]),
        bedge_b=lvl.bedge_b, bedge_w=lvl.bedge_w,
        wedge_b=lvl.wedge_b, wedge_w=lvl.wedge_w)
    lvl2.validate()
    return MultigridMesh(levels=[lvl2], variant=MeshVariant.FVCORR)


@pytest.fixture(scope="module")
def mesh():
    return irregular_mesh()


@pytest.fixture(scope="module")
def want(mesh):
    m = copy.deepcopy(mesh)
    apply_ewt_conditioning(m.levels, m.variant)
    vars_, rms = oracle.run_cycles(m, 3)
    return vars_[0], rms


@pytest.mark.parametrize("kwargs", [
    dict(accumulate="segment"),
    dict(accumulate="ell"),
    dict(accumulate="shift"),
    dict(accumulate="shift", transposed=True),
    dict(accumulate="pallas"),
])
def test_irregular_modes_match_oracle(mesh, want, kwargs):
    s = MGCFDSolver(mesh, SolverConfig(dtype="float64", **kwargs))
    s.run(cycles=3)
    np.testing.assert_allclose(s.variables(0), want[0],
                               rtol=1e-10, atol=1e-15)
    np.testing.assert_allclose(s.rms_history, want[1], rtol=1e-8)
