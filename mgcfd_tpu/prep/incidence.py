"""ELL incidence tables: scatter-free flux accumulation.

The reference solves the scatter-accumulate race three ways (serialise /
FLUX_FISSION per-edge store + gather / mesh replication; SURVEY 2.6). On a
vector machine the right answer is the transpose: compute per-edge values
edge-major (dense), then let each NODE gather the values of its incident
half-edges — a fixed-width (ELL) gather + masked sum, no write conflicts
by construction. This is FLUX_FISSION's update_edges (cfd_loops.cpp:
159-213) re-expressed as a gather so it vectorises on the VPU.

Half-edge stream layout (concatenated, in this order):
    [0, Ei)            internal a-side   (+val)
    [Ei, 2*Ei)         internal b-side   (-val)
    [2*Ei, 2*Ei+Eb)    boundary b-side   (+val)
    [..., +Ew)         wall b-side       (+val)
    [H, H+1)           one zero pad slot (gathered by padding lanes)

Tables (N, D): `slots` indexes into that stream (H = pad slot for unused
lanes), `signs` is +1/-1/0. The kernel computes
    fluxes[n] = sum_d signs[n,d] * stream[slots[n,d]]
with the sign folded into the stream for internal-b to keep the gather
free of multiplies where possible.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..core.types import MeshLevel


@dataclasses.dataclass
class IncidenceTables:
    slots: np.ndarray      # (N, D) int32 into the half-edge value stream
    signs: np.ndarray      # (N, D) int8: +1 / -1 / 0 (padding)
    width: int             # D = max node degree (over all edge classes)
    stream_len: int        # H (without the pad slot)

    @property
    def num_nodes(self):
        return self.slots.shape[0]


def build_incidence(lvl: MeshLevel) -> IncidenceTables:
    n = lvl.num_nodes
    ei = lvl.num_internal_edges
    eb = lvl.num_boundary_edges
    ew = lvl.num_wall_edges
    H = 2 * ei + eb + ew

    # destination node and sign per half-edge
    dest = np.concatenate([lvl.edge_a, lvl.edge_b, lvl.bedge_b,
                           lvl.wedge_b]).astype(np.int64)
    sign = np.concatenate([
        np.ones(ei, np.int8), -np.ones(ei, np.int8),
        np.ones(eb, np.int8), np.ones(ew, np.int8)])

    order = np.argsort(dest, kind="stable")
    dest_sorted = dest[order]
    counts = np.bincount(dest_sorted, minlength=n)
    width = max(1, int(counts.max()))

    slots = np.full((n, width), H, dtype=np.int32)  # H = zero pad slot
    signs = np.zeros((n, width), dtype=np.int8)
    # lane position of each sorted half-edge within its node's row:
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    lane = np.arange(dest.shape[0], dtype=np.int64) - starts[dest_sorted]
    slots[dest_sorted, lane] = order.astype(np.int32)
    signs[dest_sorted, lane] = sign[order]
    return IncidenceTables(slots=slots, signs=signs, width=width,
                           stream_len=H)


def ell_accumulate(tables: IncidenceTables, val_internal,
                   val_boundary, val_wall, val_internal_b=None):
    """JAX-side: fluxes[n] = sum_d signs[n,d] * stream[slots[n,d]].

    val_internal_b defaults to -val_internal (antisymmetry); pass it
    explicitly for the indirect_rw twin.
    """
    import jax.numpy as jnp

    if val_internal_b is None:
        val_internal_b = -val_internal
    stream = jnp.concatenate([
        val_internal, val_internal_b, val_boundary, val_wall,
        jnp.zeros((1, val_internal.shape[-1]), val_internal.dtype)], axis=0)
    n, d = tables.slots.shape
    # flat 1D row-gather + reshape (a 2D-indexed gather lowers to the
    # ~6 GB/s strided multi-axis XLA form on TPU; see ops/mg.py)
    gathered = stream[tables.slots.reshape(-1)].reshape(
        n, d, -1)                                 # (N, D, NVAR)
    # signs for internal-b are already folded into val_internal_b, so the
    # sign table only masks padding and fixes the +/- convention:
    s = jnp.abs(tables.signs).astype(val_internal.dtype)
    return jnp.einsum("nd,ndv->nv", s, gathered)
