"""Reader hardening against files this repo didn't write (VERDICT r03
#6): truncation, malformed headers/tokens, CRLF, duplicate neighbour
entries, out-of-range ids, degree/header mismatch — with the Python and
native parsers agreeing on both the accepted and the rejected inputs.

Reference error ergonomics anchors: io.cpp:43-47 (unreadable file ->
error exit; here: MeshFormatError), io.cpp:145-147 (edge-count header
mismatch -> WARNING, parsing continues)."""
import numpy as np
import pytest

from mgcfd_tpu.core.constants import MeshVariant
from mgcfd_tpu.mesh import generate_box_mesh, write_grid_dat
from mgcfd_tpu.mesh.io_dat import (MeshFormatError, read_grid_dat,
                                   read_mg_connectivity,
                                   write_mg_connectivity)
from mgcfd_tpu.native.loader import native_available

VAR = MeshVariant.FVCORR

PARSERS = [False] + ([True] if native_available() else [])


@pytest.fixture()
def clean_dat(tmp_path):
    lvl = generate_box_mesh(4, 3, 3, h=(0.1, 0.1, 0.1),
                            volume_jitter=0.2)
    p = tmp_path / "m.dat"
    write_grid_dat(str(p), lvl, VAR)
    return p, lvl


def _tokens(path):
    return open(path).read().split()


@pytest.mark.parametrize("native", PARSERS)
def test_truncated_neighbour_records(clean_dat, native):
    p, _ = clean_dat
    toks = _tokens(p)
    p.write_text(" ".join(toks[:len(toks) * 2 // 3]))
    with pytest.raises(MeshFormatError, match="node"):
        read_grid_dat(str(p), VAR, use_native=native)


@pytest.mark.parametrize("native", PARSERS)
def test_missing_header(tmp_path, native):
    p = tmp_path / "empty.dat"
    p.write_text("")
    with pytest.raises(MeshFormatError, match="header"):
        read_grid_dat(str(p), VAR, use_native=native)


@pytest.mark.parametrize("native", PARSERS)
def test_nonpositive_node_count(tmp_path, native):
    p = tmp_path / "zero.dat"
    p.write_text("0 0\n")
    with pytest.raises(MeshFormatError, match="node count"):
        read_grid_dat(str(p), VAR, use_native=native)


@pytest.mark.parametrize("native", PARSERS)
def test_negative_degree(tmp_path, native):
    p = tmp_path / "negdeg.dat"
    p.write_text("2 0\n1.0 -3\n1.0 0\n")
    with pytest.raises(MeshFormatError, match="negative degree"):
        read_grid_dat(str(p), VAR, use_native=native)


@pytest.mark.parametrize("native", PARSERS)
def test_non_numeric_token(clean_dat, native):
    p, _ = clean_dat
    toks = _tokens(p)
    toks[7] = "banana"
    p.write_text(" ".join(toks))
    with pytest.raises(MeshFormatError):
        read_grid_dat(str(p), VAR, use_native=native)


@pytest.mark.parametrize("native", PARSERS)
def test_edge_count_mismatch_warns_and_continues(clean_dat, native,
                                                 capsys):
    """The reference WARNS on a header/degree edge-count disagreement
    and keeps the edges actually read (io.cpp:145-147)."""
    p, lvl = clean_dat
    toks = _tokens(p)
    toks[1] = str(int(toks[1]) + 7)          # inflate the header claim
    p.write_text(" ".join(toks))
    got = read_grid_dat(str(p), VAR, use_native=native)
    assert "WARNING" in capsys.readouterr().out
    assert got.num_internal_edges == lvl.num_internal_edges


@pytest.mark.parametrize("native", PARSERS)
def test_crlf_and_foreign_whitespace(clean_dat, native):
    p, lvl = clean_dat
    text = open(p).read()
    mangled = text.replace("\n", "\r\n").replace(" ", "\t  ")
    p.write_text(mangled)
    got = read_grid_dat(str(p), VAR, use_native=native)
    np.testing.assert_array_equal(got.edge_a, lvl.edge_a)
    np.testing.assert_allclose(got.edge_w, lvl.edge_w, rtol=0,
                               atol=1e-300)
    np.testing.assert_allclose(got.volumes, lvl.volumes)


def test_duplicate_neighbour_entries_parsers_agree(tmp_path):
    """A neighbour listed twice yields two (identical) edges under the
    reference's emission rule in BOTH parsers — silent agreement, not
    silent divergence."""
    # node 1 lists node 0 twice; plus one wall face on node 0
    text = ("2 3\n"
            "1.0 1 -2 0.0 0.0 1.0\n"
            "1.0 2 0 1.0 0.0 0.0 0 1.0 0.0 0.0\n")
    p = tmp_path / "dup.dat"
    p.write_text(text)
    py = read_grid_dat(str(p), VAR, use_native=False)
    assert py.num_internal_edges == 2
    if native_available():
        nat = read_grid_dat(str(p), VAR, use_native=True)
        np.testing.assert_array_equal(nat.edge_a, py.edge_a)
        np.testing.assert_array_equal(nat.edge_b, py.edge_b)
        np.testing.assert_allclose(nat.edge_w, py.edge_w)


def test_out_of_range_neighbour_dropped_with_warning(tmp_path, capsys):
    """An id >= nel can never satisfy the emit-at-larger-endpoint rule,
    so the edge silently vanishes in the reference; the header then
    disagrees and the io.cpp:145-147 warning fires. Both parsers do the
    same."""
    text = ("2 2\n"
            "1.0 1 99 1.0 0.0 0.0\n"
            "1.0 1 0 1.0 0.0 0.0\n")
    p = tmp_path / "oor.dat"
    p.write_text(text)
    results = []
    for native in PARSERS:
        got = read_grid_dat(str(p), VAR, use_native=native)
        assert "WARNING" in capsys.readouterr().out
        results.append(got)
    for got in results:
        assert got.num_internal_edges == 1
        assert got.num_edges == 1


@pytest.mark.parametrize("native", PARSERS)
def test_truncated_coords(clean_dat, native):
    p, lvl = clean_dat
    coords = open(str(p) + ".coords").read().splitlines()
    with open(str(p) + ".coords", "w") as f:
        f.write("\n".join(coords[:-2]))
    with pytest.raises(MeshFormatError, match="x y z"):
        read_grid_dat(str(p), VAR, use_native=native, need_coords=True)


@pytest.mark.parametrize("native", PARSERS)
def test_truncated_mg_connectivity(tmp_path, native):
    p = tmp_path / "mg.dat"
    write_mg_connectivity(str(p), np.arange(10))
    toks = open(p).read().split()
    p.write_text(" ".join(toks[:6]))
    with pytest.raises(MeshFormatError):
        read_mg_connectivity(str(p), use_native=native)


@pytest.mark.parametrize("native", PARSERS)
def test_mg_bad_count(tmp_path, native):
    p = tmp_path / "mg.dat"
    p.write_text("notanumber\n1 2 3\n")
    with pytest.raises(MeshFormatError):
        read_mg_connectivity(str(p), use_native=native)
