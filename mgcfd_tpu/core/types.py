"""Typed containers for mesh levels and solver state.

Design notes (TPU-first, not a port):
  - The reference keeps one AoS edge array with -5 sentinel padding between
    internal/boundary/wall regions (io.cpp:149-181). We instead keep each
    edge class as separate, statically-shaped arrays: index vectors
    ``*_a``/``*_b`` (int32) and weight matrix ``*_w`` (E,3). Static shapes
    per class are what XLA wants; the sentinel trick exists only to serve
    CPU pointer arithmetic.
  - Node state is node-major (N,5): gathers/scatters move contiguous
    5-vectors, and XLA lays the trailing dim in lanes.
  - Arrays here are host-side numpy; `solver/` moves them to device.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from .constants import NVAR, MeshVariant


@dataclasses.dataclass
class MeshLevel:
    """One multigrid level of an unstructured 3D mesh.

    Edge conventions (match reference read_grid semantics, io.cpp:70-137):
      - internal edges connect nodes (a, b), weight = directed surface
        normal (already flipped per mesh-variant rules at build time);
        flux is accumulated +val into a and -val into b.
      - boundary ("far-field") edges touch only node b.
      - wall edges touch only node b.
    """

    volumes: np.ndarray           # (N,) float
    coords: Optional[np.ndarray]  # (N,3) float or None (single-level runs)

    edge_a: np.ndarray            # (Ei,) int32 — internal edge endpoint a
    edge_b: np.ndarray            # (Ei,) int32 — internal edge endpoint b
    edge_w: np.ndarray            # (Ei,3) float — internal edge normals

    bedge_b: np.ndarray           # (Eb,) int32 — boundary edge node
    bedge_w: np.ndarray           # (Eb,3) float

    wedge_b: np.ndarray           # (Ew,) int32 — wall edge node
    wedge_w: np.ndarray           # (Ew,3) float

    # Fine->coarse mapping to the NEXT level: mg_mapping[i] is the coarse
    # node that fine node i restricts into, defined for i < mg_size
    # (reference read_mg_connectivity, io_enhanced.cpp:629-650).
    mg_mapping: Optional[np.ndarray] = None  # (mg_size,) int64 or None

    # Optional annotation: node ids form an (nx, ny, nz) row-major grid
    # (set by the box generator). Enables structured fast paths (e.g.
    # strided-slice restriction); never required for correctness.
    structured_dims: Optional[tuple] = None

    @property
    def num_nodes(self) -> int:
        return int(self.volumes.shape[0])

    @property
    def num_internal_edges(self) -> int:
        return int(self.edge_a.shape[0])

    @property
    def num_boundary_edges(self) -> int:
        return int(self.bedge_b.shape[0])

    @property
    def num_wall_edges(self) -> int:
        return int(self.wedge_b.shape[0])

    @property
    def num_edges(self) -> int:
        return (self.num_internal_edges + self.num_boundary_edges
                + self.num_wall_edges)

    @property
    def mg_size(self) -> int:
        return 0 if self.mg_mapping is None else int(self.mg_mapping.shape[0])

    def validate(self) -> None:
        n = self.num_nodes
        assert self.edge_a.shape == self.edge_b.shape
        assert self.edge_w.shape == (self.num_internal_edges, 3)
        assert self.bedge_w.shape == (self.num_boundary_edges, 3)
        assert self.wedge_w.shape == (self.num_wall_edges, 3)
        for idx in (self.edge_a, self.edge_b, self.bedge_b, self.wedge_b):
            if idx.size:
                assert idx.min() >= 0 and idx.max() < n
        if self.coords is not None:
            assert self.coords.shape == (n, 3)


@dataclasses.dataclass
class MultigridMesh:
    """A full multigrid hierarchy plus its numerics variant."""

    levels: list[MeshLevel]
    variant: MeshVariant
    problem_size: int = 1
    name: str = "synthetic"

    @property
    def num_levels(self) -> int:
        return len(self.levels)


@dataclasses.dataclass
class SolverState:
    """Per-level device state advanced by the solver.

    Mirrors the per-level arrays of the reference driver
    (euler3d_cpu_double.cpp:145-162): variables, old_variables, residuals,
    fluxes, step_factors — but as a pytree of jnp arrays so the whole
    V-cycle can live under jit.
    """

    variables: list        # [(N_l, NVAR)]
    old_variables: list    # [(N_l, NVAR)]
    residuals: list        # [(N_l, NVAR)]
    fluxes: list           # [(N_l, NVAR)]
    step_factors: list     # [(N_l,)]

    @staticmethod
    def initial(mesh: MultigridMesh, dtype, xp=np) -> "SolverState":
        """All nodes initialised to the far-field state; everything else
        zero (reference: initialize_variables, cfd_loops.h:44-55)."""
        from .constants import far_field_state

        ff_q, _ = far_field_state(np.float64)
        variables, old, res, flux, sf = [], [], [], [], []
        for lvl in mesh.levels:
            n = lvl.num_nodes
            variables.append(xp.broadcast_to(
                xp.asarray(ff_q, dtype=dtype), (n, NVAR)) + xp.zeros((n, NVAR), dtype=dtype))
            old.append(xp.zeros((n, NVAR), dtype=dtype))
            res.append(xp.zeros((n, NVAR), dtype=dtype))
            flux.append(xp.zeros((n, NVAR), dtype=dtype))
            sf.append(xp.zeros((n,), dtype=dtype))
        return SolverState(variables, old, res, flux, sf)
