"""Native C++ parser vs the Python specification parser."""
import time

import numpy as np
import pytest

from mgcfd_tpu.core.constants import MeshVariant
from mgcfd_tpu.mesh import generate_box_mesh, write_grid_dat, \
    write_mg_connectivity
from mgcfd_tpu.mesh.io_dat import read_grid_dat, read_mg_connectivity
from mgcfd_tpu.native import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")


@pytest.mark.parametrize("variant", [MeshVariant.M6_WING,
                                     MeshVariant.FVCORR])
def test_native_matches_python(tmp_path, variant):
    lvl = generate_box_mesh(6, 5, 4, volume_jitter=0.3, seed=11)
    path = str(tmp_path / "m.dat")
    write_grid_dat(path, lvl, variant)
    py = read_grid_dat(path, variant, use_native=False)
    nat = read_grid_dat(path, variant, use_native=True)
    np.testing.assert_array_equal(nat.edge_a, py.edge_a)
    np.testing.assert_array_equal(nat.edge_b, py.edge_b)
    np.testing.assert_allclose(nat.edge_w, py.edge_w, rtol=0)
    np.testing.assert_array_equal(nat.bedge_b, py.bedge_b)
    np.testing.assert_allclose(nat.bedge_w, py.bedge_w, rtol=0)
    np.testing.assert_array_equal(nat.wedge_b, py.wedge_b)
    np.testing.assert_allclose(nat.wedge_w, py.wedge_w, rtol=0)
    np.testing.assert_allclose(nat.volumes, py.volumes, rtol=0)
    np.testing.assert_allclose(nat.coords, py.coords, rtol=0)


def test_native_mg_connectivity(tmp_path):
    m = np.array([3, 1, 4, 1, 5, 9, 2, 6], dtype=np.int64)
    path = str(tmp_path / "mg.dat")
    write_mg_connectivity(path, m)
    np.testing.assert_array_equal(
        read_mg_connectivity(path, use_native=True), m)


def test_native_is_faster(tmp_path):
    lvl = generate_box_mesh(24, 24, 24, volume_jitter=0.2)
    path = str(tmp_path / "big.dat")
    write_grid_dat(path, lvl, MeshVariant.M6_WING)
    t0 = time.perf_counter()
    read_grid_dat(path, MeshVariant.M6_WING, use_native=False)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    read_grid_dat(path, MeshVariant.M6_WING, use_native=True)
    t_nat = time.perf_counter() - t0
    assert t_nat < t_py  # typically 10-30x


def test_native_missing_file():
    with pytest.raises(IOError):
        from mgcfd_tpu.native.loader import parse_dat_native
        parse_dat_native("/nonexistent/mesh.dat", False, False)
