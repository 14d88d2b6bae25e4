"""Synthetic UNSTRUCTURED tetrahedral meshes (median-dual finite volume).

The box generator (generate.py) produces grids whose edge spans collapse
onto three values by construction — ideal for the shift-decomposition
flux, but not representative of the reference's real datasets (M6 wing,
fvcorr: tetrahedral, README.md:69-71). This generator produces a
genuinely unstructured topology with the same .dat-format semantics, so
the TPU fast paths can be *proved* (or disproved) on the workload shape
that matters, including golden cross-checks against the reference binary.

Construction: scipy Delaunay over a jittered point cloud, then the
classical median-dual finite-volume metrics:
  - node volume   = sum over incident tets of |T| / 4 (exact for the
    barycentric subdivision),
  - internal edge weight = the dual-face area vector assembled per tet
    from the two triangles (midpoint, face-centroid, tet-centroid),
    oriented a -> b,
  - hull faces contribute area/3 per vertex as boundary ("far-field")
    or wall edges (inward-pointing storage, matching generate.py).

These metrics close exactly: for an interior node the signed sum of its
incident dual faces is zero, so the far-field state is a discrete
equilibrium — the same well-posedness the reference's real meshes have.

Node ids are deterministically shuffled: an imported real mesh arrives in
arbitrary order, and the point of this generator is to exercise
prep/renumber.renumber_hierarchy + the general-mesh flux paths.
"""
from __future__ import annotations

import numpy as np

from ..core.constants import MeshVariant
from ..core.types import MeshLevel, MultigridMesh

# local vertex index pairs of a tet's 6 edges, the 2 remaining verts,
# and the parity of the permutation (p, q, r, s) of (0, 1, 2, 3): the
# dual-face quad (m, f_pqs, c, f_pqr) computes oriented q->p for an
# even slot of a positively-oriented tet (worked reference tet in
# tet_dual_level), so the p->q area vector is -S * parity * orient(tet).
_EDGE_SLOTS = [((0, 1), (2, 3), +1), ((0, 2), (1, 3), -1),
               ((0, 3), (1, 2), +1), ((1, 2), (0, 3), +1),
               ((1, 3), (0, 2), -1), ((2, 3), (0, 1), +1)]


def _jittered_points(nx: int, ny: int, nz: int, h: float, jitter: float,
                     rng) -> np.ndarray:
    """Isotropic point cloud: grid + uniform jitter. Keeps tet quality
    bounded (pure-random points make slivers) while the topology and
    node ordering stay genuinely unstructured.

    Every point is jittered in its FREE directions only: interior points
    in 3D, face points in-plane, box-edge points along the edge, corners
    fixed. The domain stays the exact convex box (so Delaunay's convex
    hull IS the domain boundary), while no grid co-planarity/
    co-sphericity survives — qhull would otherwise emit degenerate flat
    boundary tets whose faces don't pair with hull triangles, breaking
    the median-dual closure."""
    ix, iy, iz = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing="ij")
    pts = np.stack([ix, iy, iz], axis=-1).reshape(-1, 3).astype(np.float64)
    hi = np.array([nx, ny, nz], dtype=np.float64) - 1
    free = (pts > 0) & (pts < hi)          # per-coordinate freedom
    pts = pts * h
    pts += free * (rng.random(pts.shape) - 0.5) * (2 * jitter * h)
    return pts


def tet_dual_level(points: np.ndarray, tets: np.ndarray,
                   hull: np.ndarray, wall_frac: float = 0.2) -> MeshLevel:
    """Median-dual MeshLevel from a tetrahedralisation.

    points: (N,3); tets: (T,4) vertex ids; hull: (F,3) boundary triangles.
    Hull faces whose centroid sits in the lowest `wall_frac` of the
    z-extent become wall edges, the rest far-field boundary edges
    (mirroring the box generator's -z wall)."""
    n = points.shape[0]
    P = points[tets]                                 # (T, 4, 3)
    centroid = P.mean(axis=1)                        # (T, 3)
    d1, d2, d3 = (P[:, i] - P[:, 0] for i in (1, 2, 3))
    det6 = np.einsum("ti,ti->t", d1, np.cross(d2, d3))
    vol_t = np.abs(det6) / 6.0
    orient = np.sign(det6)
    orient[orient == 0] = 1.0  # degenerate tets contribute zero anyway

    volumes = np.zeros(n)
    np.add.at(volumes, tets.ravel(), np.repeat(vol_t / 4.0, 4))

    # --- internal edges: dual-face area vectors, accumulated per edge ---
    keys, vecs = [], []
    for (i, j), (k, l), parity in _EDGE_SLOTS:
        p, q = tets[:, i], tets[:, j]
        Pp, Pq, Pr, Ps = P[:, i], P[:, j], P[:, k], P[:, l]
        m = 0.5 * (Pp + Pq)
        f1 = (Pp + Pq + Ps) / 3.0
        f2 = (Pp + Pq + Pr) / 3.0
        S = 0.5 * (np.cross(f1 - m, centroid - m)
                   + np.cross(centroid - m, f2 - m))
        # orient p -> q (see _EDGE_SLOTS), then canonicalise to (min, max)
        S = S * (-parity * orient)[:, None]
        a = np.minimum(p, q)
        b = np.maximum(p, q)
        S = np.where((p > q)[:, None], -S, S)
        keys.append(a.astype(np.int64) * n + b)
        vecs.append(S)
    keys = np.concatenate(keys)
    vecs = np.concatenate(vecs)
    uniq, inv = np.unique(keys, return_inverse=True)
    edge_w = np.zeros((uniq.shape[0], 3))
    np.add.at(edge_w, inv, vecs)
    edge_a = (uniq // n).astype(np.int32)
    edge_b = (uniq % n).astype(np.int32)
    # emission order: ascending b, then a (the box generator's convention)
    order = np.lexsort((edge_a, edge_b))
    edge_a, edge_b, edge_w = edge_a[order], edge_b[order], edge_w[order]

    # --- hull faces: outward area / 3 per vertex, stored inward ---
    A, B, C = points[hull[:, 0]], points[hull[:, 1]], points[hull[:, 2]]
    fnorm = 0.5 * np.cross(B - A, C - A)             # (F, 3)
    fcent = (A + B + C) / 3.0
    outward = np.einsum("fi,fi->f", fnorm,
                        fcent - points.mean(axis=0)) >= 0
    fnorm = np.where(outward[:, None], fnorm, -fnorm)
    zmin, zmax = points[:, 2].min(), points[:, 2].max()
    is_wall = fcent[:, 2] <= zmin + wall_frac * (zmax - zmin)

    face_b = hull.ravel().astype(np.int32)           # (3F,)
    face_w = np.repeat(-fnorm / 3.0, 3, axis=0)      # inward storage
    face_is_wall = np.repeat(is_wall, 3)

    bedge_b = face_b[~face_is_wall]
    bedge_w = face_w[~face_is_wall]
    wedge_b = face_b[face_is_wall]
    wedge_w = face_w[face_is_wall]
    bo = np.argsort(bedge_b, kind="stable")
    wo = np.argsort(wedge_b, kind="stable")

    lvl = MeshLevel(volumes=volumes, coords=points.copy(),
                    edge_a=edge_a, edge_b=edge_b, edge_w=edge_w,
                    bedge_b=bedge_b[bo], bedge_w=bedge_w[bo],
                    wedge_b=wedge_b[wo].astype(np.int32),
                    wedge_w=wedge_w[wo])
    lvl.validate()
    return lvl


def _delaunay_level(points: np.ndarray, rng) -> MeshLevel:
    from scipy.spatial import Delaunay

    # shuffle ids: imported meshes arrive in arbitrary order, and the
    # fast paths must not depend on the generator's grid-seeded layout
    perm = rng.permutation(points.shape[0])
    pts = points[perm]
    tri = Delaunay(pts)
    return tet_dual_level(pts, tri.simplices.astype(np.int64),
                          tri.convex_hull.astype(np.int64))


def generate_unstructured_mesh(nx: int, ny: int, nz: int, *,
                               h: float = 1.0, jitter: float = 0.35,
                               seed: int = 0) -> MeshLevel:
    """Single unstructured tetrahedral level, ~nx*ny*nz nodes."""
    rng = np.random.default_rng(seed)
    return _delaunay_level(_jittered_points(nx, ny, nz, h, jitter, rng),
                           rng)


def generate_unstructured_hierarchy(
        nx: int, ny: int, nz: int, num_levels: int, *, h: float = 1.0,
        jitter: float = 0.35, seed: int = 0,
        variant: MeshVariant = MeshVariant.M6_WING,
        name: str = "tet") -> MultigridMesh:
    """Multigrid hierarchy of INDEPENDENT unstructured tet meshes with
    nearest-coarse-node mappings — the reference's real dataset shape
    (each M6 level is an independently generated mesh; the mg files map
    fine nodes onto nearest coarse nodes)."""
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(seed)
    levels: list[MeshLevel] = []
    dims = (nx, ny, nz)
    spacing = h
    for l in range(num_levels):
        levels.append(_delaunay_level(
            _jittered_points(*dims, spacing, jitter, rng), rng))
        dims = tuple(max(2, -(-d // 2)) for d in dims)
        spacing *= 2.0
    for l in range(num_levels - 1):
        fine, coarse = levels[l], levels[l + 1]
        _, nearest = cKDTree(coarse.coords).query(fine.coords)
        fine.mg_mapping = nearest.astype(np.int64)
    return MultigridMesh(levels=levels, variant=variant, name=name)


def dual_closure_error(lvl: MeshLevel) -> float:
    """Max |signed sum of incident area vectors| per node (interior AND
    boundary: hull contributions close the boundary cells). A correct
    median-dual construction gives ~1e-12 * typical face area."""
    acc = np.zeros((lvl.num_nodes, 3))
    np.add.at(acc, lvl.edge_a, lvl.edge_w)
    np.add.at(acc, lvl.edge_b, -lvl.edge_w)
    # stored inward => outward closure adds the negation
    np.add.at(acc, lvl.bedge_b, -lvl.bedge_w)
    np.add.at(acc, lvl.wedge_b, -lvl.wedge_w)
    return float(np.abs(acc).max())
