"""Reference-format mesh I/O.

File formats (all plain text, matching warwick-hpsc/MG-CFD-app-plain):

  <mesh>.dat      (io.cpp:56-137)  header "nel number_of_edges"; then per
                  node: volume, degree, then degree x (neighbour ex ey ez).
                  Neighbour -1 = far-field boundary face, -2 = wall face.
  <mesh>.dat.coords  (io.cpp:49-81)  "x y z" per node; required when the
                  run has >1 level.
  <mg file>       (io_enhanced.cpp:629-650)  count then `count` node ids:
                  fine node i -> coarse node id.
  input.dat       (io_enhanced.cpp:407-579)  keys size / num_levels /
                  mesh_name; sections [levels] and [mg_mapping] with
                  idx=filename lines.

The writers exist so the reference C++ binary can consume synthetic meshes
(golden-output generation); the readers let this framework consume real
MG-CFD datasets.
"""
from __future__ import annotations

import os

import numpy as np

from ..core.constants import MeshVariant
from ..core.types import MeshLevel, MultigridMesh
from .build import build_edges_from_adjacency


class MeshFormatError(ValueError):
    """Malformed mesh / connectivity / coords file.

    The reference exits with an error on unreadable files
    (io.cpp:43-47) and WARNS when the header's edge count disagrees
    with the records actually read (io.cpp:145-147); this framework
    raises for structural corruption and reproduces the warning for
    the count mismatch. Raised identically by the Python and native
    parsers."""


def _warn_edge_mismatch(path: str, claimed: int, actual: int) -> None:
    """The reference's non-fatal degree/header disagreement diagnostic
    (io.cpp:145-147): parsing continues with the edges actually read."""
    if claimed != actual:
        print(f"WARNING: {path}: header claims {claimed} edges but "
              f"{actual} were read; continuing with {actual}")


# ---------------------------------------------------------------------------
# .dat grid files
# ---------------------------------------------------------------------------

def _adjacency_listing(lvl: MeshLevel, variant: MeshVariant):
    """Reconstruct a per-node adjacency listing whose read-back through the
    reference's parsing rules reproduces `lvl` exactly.

    Internal final normals point a->b; the listing convention is outward
    face normals per node, and the reference flips the (emitted) entry at
    the larger endpoint — see mesh.build for the rules."""
    n = lvl.num_nodes
    ids: list[list[int]] = [[] for _ in range(n)]
    wts: list[list[np.ndarray]] = [[] for _ in range(n)]

    for a, b, w in zip(lvl.edge_a, lvl.edge_b, lvl.edge_w):
        # listing at the smaller node first so that per-node listing order
        # is stable; the emitting entry is the one at node b.
        ids[int(a)].append(int(b))
        wts[int(a)].append(w)          # outward from a = +w (a->b)
    for a, b, w in zip(lvl.edge_a, lvl.edge_b, lvl.edge_w):
        ids[int(b)].append(int(a))
        wts[int(b)].append(-w)         # outward from b = -w

    flip_bw = -1.0 if variant.flips_all_normals else 1.0
    for b, w in zip(lvl.bedge_b, lvl.bedge_w):
        ids[int(b)].append(-1)
        wts[int(b)].append(flip_bw * w)
    for b, w in zip(lvl.wedge_b, lvl.wedge_w):
        ids[int(b)].append(-2)
        wts[int(b)].append(flip_bw * w)
    return ids, wts


def write_grid_dat(path: str, lvl: MeshLevel, variant: MeshVariant,
                   write_coords: bool = True) -> None:
    ids, wts = _adjacency_listing(lvl, variant)
    num_edges = lvl.num_edges
    with open(path, "w") as f:
        f.write(f"{lvl.num_nodes} {num_edges}\n")
        for i in range(lvl.num_nodes):
            parts = [f"{lvl.volumes[i]:.17e}", str(len(ids[i]))]
            for j, w in zip(ids[i], wts[i]):
                parts.append(str(j))
                parts.extend(f"{c:.17e}" for c in w)
            f.write(" ".join(parts) + "\n")
    if write_coords and lvl.coords is not None:
        with open(path + ".coords", "w") as f:
            for c in lvl.coords:
                f.write(f"{c[0]:.17e} {c[1]:.17e} {c[2]:.17e}\n")


def read_grid_dat(path: str, variant: MeshVariant,
                  need_coords: bool = True,
                  use_native: bool = True) -> MeshLevel:
    """Parse a .dat mesh with the reference's read_grid semantics
    (io.cpp:56-137): tokens are whitespace-separated; edge emitted when the
    listed neighbour id is below the current node id.

    Uses the C++ parser (native/mesh_parser.cpp, ~20x faster on
    million-edge meshes) when the toolchain is available; this Python
    path is the behavioural specification and fallback."""
    if use_native:
        try:
            from ..native.loader import parse_dat_native
            lvl = parse_dat_native(path, variant.flips_all_normals,
                                   need_coords)
            if lvl is not None:
                return lvl
        except ImportError:
            pass
    with open(path) as f:
        toks = f.read().split()
    if len(toks) < 2:
        raise MeshFormatError(f"{path}: missing 'nel num_edges' header")
    try:
        nel = int(toks[0])
        num_edges_claimed = int(toks[1])
    except ValueError:
        raise MeshFormatError(
            f"{path}: malformed header {toks[0]!r} {toks[1]!r}") from None
    if nel <= 0:
        raise MeshFormatError(f"{path}: non-positive node count {nel}")
    pos = 2

    volumes = np.empty(nel)
    neighbour_ids: list[np.ndarray] = []
    neighbour_wts: list[np.ndarray] = []
    for i in range(nel):
        if pos + 2 > len(toks):
            raise MeshFormatError(
                f"{path}: truncated at node {i} of {nel} "
                f"(volume/degree missing)")
        try:
            volumes[i] = float(toks[pos])
            deg = int(toks[pos + 1])
        except ValueError:
            raise MeshFormatError(
                f"{path}: bad volume/degree at node {i}: "
                f"{toks[pos]!r} {toks[pos + 1]!r}") from None
        if deg < 0:
            raise MeshFormatError(
                f"{path}: negative degree {deg} at node {i}")
        pos += 2
        flat = toks[pos:pos + 4 * deg]
        pos += 4 * deg
        if len(flat) < 4 * deg:
            raise MeshFormatError(
                f"{path}: truncated neighbour records at node {i} "
                f"(need {deg}, file ends early)")
        try:
            arr = np.array(flat, dtype=np.float64).reshape(deg, 4)
        except ValueError:
            raise MeshFormatError(
                f"{path}: non-numeric neighbour record at node {i}"
            ) from None
        neighbour_ids.append(arr[:, 0].astype(np.int64))
        neighbour_wts.append(arr[:, 1:4])

    coords = None
    coords_path = path + ".coords"
    if need_coords and os.path.exists(coords_path):
        try:
            coords = np.loadtxt(coords_path,
                                dtype=np.float64).reshape(nel, 3)
        except ValueError:
            raise MeshFormatError(
                f"{coords_path}: expected {nel} 'x y z' rows") from None

    lvl = build_edges_from_adjacency(volumes, coords, neighbour_ids,
                                     neighbour_wts, variant)
    _warn_edge_mismatch(path, num_edges_claimed, lvl.num_edges)
    return lvl


# ---------------------------------------------------------------------------
# multigrid connectivity
# ---------------------------------------------------------------------------

def write_mg_connectivity(path: str, mapping: np.ndarray) -> None:
    with open(path, "w") as f:
        f.write(f"{mapping.shape[0]}\n")
        f.write("\n".join(str(int(x)) for x in mapping))
        f.write("\n")


def read_mg_connectivity(path: str, use_native: bool = True) -> np.ndarray:
    if use_native:
        try:
            from ..native.loader import parse_mg_native
            out = parse_mg_native(path)
            if out is not None:
                return out
        except ImportError:
            pass
    with open(path) as f:
        toks = f.read().split()
    if not toks:
        raise MeshFormatError(f"{path}: empty mg connectivity file")
    try:
        count = int(toks[0])
    except ValueError:
        raise MeshFormatError(
            f"{path}: malformed count {toks[0]!r}") from None
    if count < 0:
        raise MeshFormatError(f"{path}: negative count {count}")
    if len(toks) - 1 < count:
        raise MeshFormatError(
            f"{path}: truncated (header claims {count} ids, "
            f"{len(toks) - 1} present)")
    try:
        return np.array(toks[1:1 + count], dtype=np.int64)
    except ValueError:
        raise MeshFormatError(f"{path}: non-integer mg id") from None


# ---------------------------------------------------------------------------
# input.dat descriptor
# ---------------------------------------------------------------------------

def write_input_dat(path: str, mesh: MultigridMesh,
                    level_files: list[str], mg_files: list[str]) -> None:
    with open(path, "w") as f:
        f.write(f"size = {mesh.problem_size}\n")
        f.write(f"num_levels = {mesh.num_levels}\n")
        f.write(f"mesh_name = {mesh.variant.value}\n")
        f.write("[levels]\n")
        for i, name in enumerate(level_files):
            f.write(f"{i} = {name}\n")
        if mg_files:
            f.write("[mg_mapping]\n")
            for i, name in enumerate(mg_files):
                f.write(f"{i} = {name}\n")


def read_input_dat(path: str):
    """Returns (problem_size, num_levels, variant, level_files, mg_files)."""
    problem_size = None
    num_levels = None
    variant = None
    level_files: dict[int, str] = {}
    mg_files: dict[int, str] = {}
    section = None
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            if line.startswith("["):
                section = line
                continue
            if "=" not in line:
                continue
            key, value = (s.strip() for s in line.split("=", 1))
            if section == "[levels]":
                level_files[int(key)] = value
            elif section == "[mg_mapping]":
                mg_files[int(key)] = value
            elif key == "size":
                problem_size = int(value)
            elif key == "num_levels":
                num_levels = int(value)
            elif key == "mesh_name":
                variant = MeshVariant(value)
    if problem_size is None or num_levels is None or variant is None:
        raise ValueError(f"{path}: missing size/num_levels/mesh_name")
    levels = [level_files[i] for i in range(num_levels)]
    mgs = [mg_files[i] for i in range(num_levels - 1)] if mg_files else []
    return problem_size, num_levels, variant, levels, mgs


def load_multigrid_mesh(input_dat_path: str,
                        directory: str = "",
                        use_cache: bool = True) -> MultigridMesh:
    """Load a complete hierarchy the way the reference driver does
    (euler3d_cpu_double.cpp:104-254), including the binary-cache fast
    path (read_grid_from_bin, euler3d:176-230): each level (and its MG
    connectivity) goes through the npz sidecar cache in mesh.cache, with
    corrupt/stale caches falling back to the parser."""
    from ..utils.logging import log
    base = directory or os.path.dirname(input_dat_path)
    size, num_levels, variant, level_files, mg_files = read_input_dat(
        input_dat_path)
    log("read_input_dat: %d levels, variant=%s", num_levels,
        variant.value)
    levels = []
    for i, name in enumerate(level_files):
        mg_path = (os.path.join(base, mg_files[i])
                   if i < num_levels - 1 and mg_files else None)
        if use_cache:
            from .cache import load_mesh_cached
            lvl = load_mesh_cached(os.path.join(base, name), variant,
                                   need_coords=num_levels > 1,
                                   mg_path=mg_path)
        else:
            lvl = read_grid_dat(os.path.join(base, name), variant,
                                need_coords=num_levels > 1)
            if mg_path:
                lvl.mg_mapping = read_mg_connectivity(mg_path)
        log("level %d: %d nodes, %d/%d/%d internal/boundary/wall edges",
            i, lvl.num_nodes, lvl.num_internal_edges,
            lvl.num_boundary_edges, lvl.num_wall_edges)
        levels.append(lvl)
    return MultigridMesh(levels=levels, variant=variant, problem_size=size,
                         name=os.path.basename(input_dat_path))
