"""Shared mesh-construction semantics.

Both the synthetic generator and the .dat parser funnel through
``build_edges_from_adjacency`` so that edge classification, dedup and
normal-flip rules are defined in exactly one place. The rules mirror the
reference's read_grid (io.cpp:70-137):

  - scanning nodes in ascending id order, a node's neighbour entry (j, w)
    emits an edge only when j < i (dedup: each internal edge is listed by
    both endpoints, the occurrence at the larger node wins);
  - neighbour id -1 => far-field boundary edge, -2 => wall edge, else
    internal edge (a=j, b=i);
  - FVCORR flips every normal (Rodinia compatibility); all other variants
    flip only internal-edge normals (io.cpp:117-133);
  - edges are kept grouped internal / boundary / wall, in emission order.
"""
from __future__ import annotations

import numpy as np

from ..core.constants import MeshVariant
from ..core.types import MeshLevel

BOUNDARY_NEIGHBOUR = -1
WALL_NEIGHBOUR = -2


def build_edges_from_adjacency(
    volumes: np.ndarray,
    coords: np.ndarray | None,
    neighbour_ids: list[np.ndarray],
    neighbour_weights: list[np.ndarray],
    variant: MeshVariant,
) -> MeshLevel:
    """neighbour_ids[i] / neighbour_weights[i]: the (degree_i,) ids and
    (degree_i, 3) weights listed for node i, in listing order."""
    n = len(neighbour_ids)
    ia, ib, iw = [], [], []
    bb, bw = [], []
    wb, ww = [], []
    for i in range(n):
        ids = neighbour_ids[i]
        wts = neighbour_weights[i]
        for j in range(len(ids)):
            i2 = int(ids[j])
            if i2 >= i:
                continue
            w = wts[j].astype(np.float64).copy()
            if i2 == BOUNDARY_NEIGHBOUR:
                if variant.flips_all_normals:
                    w = -w
                bb.append(i)
                bw.append(w)
            elif i2 == WALL_NEIGHBOUR:
                if variant.flips_all_normals:
                    w = -w
                wb.append(i)
                ww.append(w)
            else:
                # internal edge is added "backwards" (a < b), so its normal
                # is always flipped (io.cpp:117-133 — both branches flip
                # internal edges).
                ia.append(i2)
                ib.append(i)
                iw.append(-w)

    def _idx(x):
        return np.asarray(x, dtype=np.int32) if x else np.zeros(0, np.int32)

    def _wts(x):
        return (np.asarray(x, dtype=np.float64)
                if x else np.zeros((0, 3), np.float64))

    lvl = MeshLevel(
        volumes=np.asarray(volumes, dtype=np.float64),
        coords=None if coords is None else np.asarray(coords, np.float64),
        edge_a=_idx(ia), edge_b=_idx(ib), edge_w=_wts(iw),
        bedge_b=_idx(bb), bedge_w=_wts(bw),
        wedge_b=_idx(wb), wedge_w=_wts(ww),
    )
    lvl.validate()
    return lvl


def apply_ewt_conditioning(mesh_levels: list[MeshLevel],
                           variant: MeshVariant) -> None:
    """In-place edge-weight conditioning for NaN-prone mesh variants.

    adjust_ewt divides each internal-edge normal by the endpoint distance
    (validation.cpp:28-59 — only edges with both endpoints valid, which in
    our layout is exactly the internal class); dampen_ewt scales ALL edge
    normals by the variant's damping factor (validation.cpp:61-75 operates
    on the whole padded array; the -5 padding it also scales is inert).
    Driver behaviour: euler3d_cpu_double.cpp:333-352.
    """
    factor = variant.ewt_damping_factor
    if factor is None:
        return
    for lvl in mesh_levels:
        assert lvl.coords is not None, "ewt conditioning requires coords"
        d = lvl.coords[lvl.edge_b] - lvl.coords[lvl.edge_a]
        dist = np.sqrt((d * d).sum(axis=1))
        lvl.edge_w = (lvl.edge_w / dist[:, None]) * factor
        lvl.bedge_w = lvl.bedge_w * factor
        lvl.wedge_w = lvl.wedge_w * factor
