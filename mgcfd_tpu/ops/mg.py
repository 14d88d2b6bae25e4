"""Geometric-multigrid transfer operators.

Restriction transfers the *solution variables* fine->coarse (the
reference's residual-restriction path is compiled out as NaN-prone:
euler3d_cpu_double.cpp:522-553). Prolongation interpolates coarse
*residuals* onto fine nodes and applies a correction. Only the reference's
live operator — prolong_residuals_interpolate_proper (mg_loops.cpp:678-864,
call site euler3d_cpu_double.cpp:671-681) — is implemented; its four dead
predecessors (prolong/prolong_residuals/prolong_interpolate/..._crude) are
disabled in the reference and intentionally not reproduced.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mg_restrict(vars_fine, vars_coarse, mapping, num_coarse_nodes):
    """Segment-mean of fine variables into their coarse parents.

    Reference (mg_loops.cpp:30-202): zero the *mapped* coarse nodes,
    scatter-accumulate fine values, count contributions, divide by count.
    Unmapped coarse nodes keep their previous values (average=1 branch,
    mg_loops.cpp:176). mapping[i] is defined for fine node i only for
    i < len(mapping) (mg_loops.cpp:119-142).
    """
    mgc = mapping.shape[0]
    contrib = vars_fine[:mgc]
    sums = jax.ops.segment_sum(contrib, mapping,
                               num_segments=num_coarse_nodes)
    counts = jax.ops.segment_sum(
        jnp.ones((mgc,), dtype=vars_fine.dtype), mapping,
        num_segments=num_coarse_nodes)
    mapped = counts > 0
    safe = jnp.where(mapped, counts, jnp.ones_like(counts))
    return jnp.where(mapped[:, None], sums / safe[:, None], vars_coarse)


def mg_restrict_gather(vars_fine, vars_coarse, children, child_mask,
                       mapped):
    """Gather-transpose restriction: each coarse node gathers its children
    (precomputed inverse of the fine->coarse mapping) and averages —
    identical semantics to mg_restrict with the scatter turned into a
    fixed-width gather (TPU: scatters serialise, gathers don't).

    children: (Nc, Cmax) fine ids (0 where padded); child_mask: (Nc, Cmax)
    1/0; mapped: (Nc,) bool (count>0)."""
    # flat 1D row-gather + reshape: a (Nc, Cmax)-indexed gather lowers to
    # XLA's strided multi-axis form at ~6 GB/s on TPU; the flat form runs
    # at the gather engine's full row rate (found by xprof, BASELINE.md)
    nc, cmax = children.shape
    gathered = vars_fine[children.reshape(-1)].reshape(
        nc, cmax, vars_fine.shape[1])                    # (Nc, Cmax, 5)
    sums = jnp.einsum("ncv,nc->nv", gathered,
                      child_mask.astype(vars_fine.dtype))
    counts = jnp.sum(child_mask, axis=1).astype(vars_fine.dtype)
    safe = jnp.where(mapped, counts, jnp.ones_like(counts))
    return jnp.where(mapped[:, None], sums / safe[:, None], vars_coarse)


def build_restrict_children(mapping, num_coarse_nodes):
    """Host-side inversion of the fine->coarse mapping into an ELL table.
    Returns (children, child_mask, mapped) numpy arrays."""
    import numpy as np

    mapping = np.asarray(mapping)
    counts = np.bincount(mapping, minlength=num_coarse_nodes)
    cmax = max(1, int(counts.max()))
    children = np.zeros((num_coarse_nodes, cmax), np.int32)
    mask = np.zeros((num_coarse_nodes, cmax), np.float64)
    order = np.argsort(mapping, kind="stable")
    starts = np.zeros(num_coarse_nodes + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    lane = np.arange(mapping.shape[0]) - starts[mapping[order]]
    children[mapping[order], lane] = order.astype(np.int32)
    mask[mapping[order], lane] = 1.0
    return children, mask, counts > 0


def _inv_dist(dx):
    return 1.0 / jnp.sqrt(jnp.sum(dx * dx, axis=-1))


def prolong_residuals_interpolate(res_coarse, res_fine, vars_fine,
                                  mapping, coords_coarse, coords_fine,
                                  edge_a, edge_b):
    """Edge-based inverse-distance interpolation of coarse residuals onto
    fine nodes, then vars_fine += res_fine - interpolated.

    Faithful to mg_loops.cpp:678-864 including its quirks:
      - a fine node exactly coincident with its coarse parent (coordinate
        equality, not tolerance) takes the parent's residual directly with
        weight 1 (mg_loops.cpp:745-752);
      - the cross contribution "a1 -> b2" uses the DISTANCE to a1 but the
        RESIDUAL of b1 (mg_loops.cpp:804-810) — a reference bug kept for
        output parity;
      - fine nodes touched by no internal edge divide 0/0 in the reference;
        here they are guarded to interpolate 0 (documented divergence —
        such nodes do not occur in real meshes).

    edge_a/edge_b: the FINE level's internal edges (the reference passes
    edges[level] limited to num_internal_edges, euler3d:671-681).
    """
    num_fine = vars_fine.shape[0]
    parent = mapping  # (num_fine,) in practice; indexed by fine node id

    coincident = jnp.all(coords_fine == coords_coarse[parent], axis=-1)

    a1 = parent[edge_a]
    b1 = parent[edge_b]
    ca1, cb1 = coords_coarse[a1], coords_coarse[b1]
    ca2, cb2 = coords_fine[edge_a], coords_fine[edge_b]
    r_a1, r_b1 = res_coarse[a1], res_coarse[b1]

    id_a1a2 = _inv_dist(ca2 - ca1)
    id_b1a2 = _inv_dist(cb1 - ca2)
    id_b1b2 = _inv_dist(cb2 - cb1)
    id_a1b2 = _inv_dist(ca1 - cb2)

    live_a = (~coincident[edge_a]).astype(vars_fine.dtype)
    live_b = (~coincident[edge_b]).astype(vars_fine.dtype)

    # contribution streams into fine nodes a2 and b2:
    val_a = live_a[:, None] * (id_a1a2[:, None] * r_a1
                               + id_b1a2[:, None] * r_b1)
    w_a = live_a * (id_a1a2 + id_b1a2)
    # note r_b1 twice: the reference's a1->b2 term reads residuals1[b1].
    val_b = live_b[:, None] * ((id_b1b2 + id_a1b2)[:, None] * r_b1)
    w_b = live_b * (id_b1b2 + id_a1b2)

    dest = jnp.concatenate([edge_a, edge_b])
    acc = jax.ops.segment_sum(jnp.concatenate([val_a, val_b]), dest,
                              num_segments=num_fine)
    wsum = jax.ops.segment_sum(jnp.concatenate([w_a, w_b]), dest,
                               num_segments=num_fine)

    safe_w = jnp.where(wsum > 0, wsum, jnp.ones_like(wsum))
    wavg = jnp.where(coincident[:, None], res_coarse[parent],
                     acc / safe_w[:, None])
    return vars_fine + (res_fine - wavg)


# ---------------------------------------------------------------------------
# structured (parity) coarsening fast paths — no gathers at all
# ---------------------------------------------------------------------------

def is_parity_coarsening(mapping, fdims, cdims) -> bool:
    """True iff mapping equals the canonical 2x-per-dimension parity
    coarsening of an (fnx,fny,fnz) row-major grid onto (cnx,cny,cnz)."""
    import numpy as np

    fnx, fny, fnz = fdims
    cnx, cny, cnz = cdims
    if mapping is None or mapping.shape[0] != fnx * fny * fnz:
        return False
    if tuple(-(-d // 2) for d in fdims) != tuple(cdims):
        return False
    fi = np.arange(fnx * fny * fnz)
    fz = fi % fnz
    fy = (fi // fnz) % fny
    fx = fi // (fnz * fny)
    canon = ((fx // 2) * cny + (fy // 2)) * cnz + (fz // 2)
    return bool(np.array_equal(mapping, canon))


def mg_restrict_structured(vars_fine, vars_coarse, fdims, cdims,
                           counts, mapped):
    """Parity restriction: reshape to the grid and sum the eight strided
    parity slices — zero indirect addressing. Semantics identical to
    mg_restrict_gather (average; unmapped keep old)."""
    fnx, fny, fnz = fdims
    cnx, cny, cnz = cdims
    nv = vars_fine.shape[-1]
    f = vars_fine.reshape(fnx, fny, fnz, nv)
    zero = jnp.zeros((), vars_fine.dtype)
    sums = jnp.zeros((cnx, cny, cnz, nv), vars_fine.dtype)
    for i in (0, 1):
        for j in (0, 1):
            for k in (0, 1):
                # lax.slice, NOT f[i::2, j::2, k::2]: multi-axis strided
                # jnp indexing lowers to an HLO *gather* (~7 GB/s on TPU,
                # profiled); lax.slice emits a true strided slice. The
                # odd-dimension shortfall is lax.pad (fusable), not a
                # scatter-add.
                sl = jax.lax.slice(f, (i, j, k, 0), (fnx, fny, fnz, nv),
                                   (2, 2, 2, 1))
                sums = sums + jax.lax.pad(
                    sl, zero, [(0, cnx - sl.shape[0], 0),
                               (0, cny - sl.shape[1], 0),
                               (0, cnz - sl.shape[2], 0), (0, 0, 0)])
    sums = sums.reshape(cnx * cny * cnz, nv)
    safe = jnp.where(mapped, counts, jnp.ones_like(counts))
    return jnp.where(mapped[:, None], sums / safe[:, None], vars_coarse)


def _z_dup_matrix(cnz, fnz, dtype):
    """0/1 matrix mapping coarse-z to duplicated-and-cropped fine-z.

    Duplicating the INNERMOST spatial axis with broadcast_to interleaves
    at lane granularity — measured 26 GB/s on v5e (xprof). As a matmul
    with this selection matrix the MXU streams it at memory speed
    (~7x faster end-to-end), and the result is BITWISE identical: every
    output element is exactly one input times 1.0 (the bf16x3 f32
    matmul decomposition is exact for that, so is the f32 accumulate of
    a single term)."""
    D = np.zeros((cnz, fnz))
    k = np.arange(cnz)
    for i in (0, 1):
        col = 2 * k + i
        ok = col < fnz
        D[k[ok], col[ok]] = 1.0
    return jnp.asarray(D, dtype)


def structured_upsample(res_coarse, fdims, cdims):
    """G = res_coarse[parity_mapping] as dense 2x repeats + crop:
    the parent-gather of the prolongation, gather-free.

    x/y duplication is outer-dim broadcast (contiguous block copies);
    z duplication rides the MXU via _z_dup_matrix (exact)."""
    fnx, fny, fnz = fdims
    cnx, cny, cnz = cdims
    nv = res_coarse.shape[-1]
    c = res_coarse.reshape(cnx, cny, cnz, nv)
    D = _z_dup_matrix(cnz, fnz, res_coarse.dtype)
    cz = jnp.einsum("xyzv,zf->xyfv", c, D,
                    precision=jax.lax.Precision.HIGHEST)
    up = jnp.broadcast_to(cz[:, None, :, None, :, :],
                          (cnx, 2, cny, 2, fnz, nv)
                          ).reshape(2 * cnx, 2 * cny, fnz, nv)
    return up[:fnx, :fny].reshape(fnx * fny * fnz, nv)


def t_mg_restrict_structured(vars_fine_t, vars_coarse_t, fdims, cdims,
                             counts, mapped):
    """Variable-major twin of mg_restrict_structured, on (5, N) state.

    Under the whole-cycle transposed layout the node-major version costs
    a fine-level transpose whose strided parity slices then lower to
    ~7 GB/s index-gathers (profiled as 30% of device time on the
    flagship cycle); operating on (5, N) directly keeps them as plain
    strided slices. Same add order as the node-major twin."""
    fnx, fny, fnz = fdims
    cnx, cny, cnz = cdims
    nv = vars_fine_t.shape[0]
    f = vars_fine_t.reshape(nv, fnx, fny, fnz)
    zero = jnp.zeros((), vars_fine_t.dtype)
    sums = jnp.zeros((nv, cnx, cny, cnz), vars_fine_t.dtype)
    for i in (0, 1):
        for j in (0, 1):
            for k in (0, 1):
                # lax.slice + lax.pad, not strided indexing + scatter —
                # see mg_restrict_structured
                sl = jax.lax.slice(f, (0, i, j, k), (nv, fnx, fny, fnz),
                                   (1, 2, 2, 2))
                sums = sums + jax.lax.pad(
                    sl, zero, [(0, 0, 0), (0, cnx - sl.shape[1], 0),
                               (0, cny - sl.shape[2], 0),
                               (0, cnz - sl.shape[3], 0)])
    sums = sums.reshape(nv, cnx * cny * cnz)
    safe = jnp.where(mapped, counts, jnp.ones_like(counts))
    return jnp.where(mapped[None, :], sums / safe[None, :], vars_coarse_t)


def t_structured_upsample(res_coarse, fdims, cdims):
    """Variable-major twin of structured_upsample: node-major (Nc, 5)
    coarse residuals -> (5, Nf). The transpose happens at COARSE size;
    the fine-size G.T it replaces was a full-level relayout."""
    fnx, fny, fnz = fdims
    cnx, cny, cnz = cdims
    nv = res_coarse.shape[-1]
    c = res_coarse.T.reshape(nv, cnx, cny, cnz)
    # z duplication on the MXU (see _z_dup_matrix: exact, ~7x the
    # interleaving broadcast_to measured at 26 GB/s); x/y duplication
    # stays a contiguous outer-dim broadcast
    D = _z_dup_matrix(cnz, fnz, res_coarse.dtype)
    cz = jnp.einsum("vxyz,zf->vxyf", c, D,
                    precision=jax.lax.Precision.HIGHEST)
    up = jnp.broadcast_to(cz[:, :, None, :, None, :],
                          (nv, cnx, 2, cny, 2, fnz)
                          ).reshape(nv, 2 * cnx, 2 * cny, fnz)
    return up[:, :fnx, :fny].reshape(nv, fnx * fny * fnz)


# ---------------------------------------------------------------------------
# gather-transpose prolongation (TPU-fast; same semantics)
# ---------------------------------------------------------------------------

def build_prolong_tables(fine_coords, coarse_coords, mapping,
                         edge_a, edge_b):
    """Host-side static geometry + incidence for prolong_gather.

    All inverse distances, parents, coincidence flags and the node->
    half-edge incidence are mesh constants; at run time prolongation
    reduces to two replicated-coarse gathers, vectorised arithmetic and
    one fixed-width node gather. Returns a dict of numpy arrays."""
    import numpy as np

    ei = edge_a.shape[0]
    a1 = mapping[edge_a]
    b1 = mapping[edge_b]
    coincident = np.all(fine_coords == coarse_coords[mapping], axis=1)

    def idist(p, q):
        d = p - q
        with np.errstate(divide="ignore"):
            return 1.0 / np.sqrt((d * d).sum(axis=1))

    ca1, cb1 = coarse_coords[a1], coarse_coords[b1]
    ca2, cb2 = fine_coords[edge_a], fine_coords[edge_b]
    live_a = (~coincident[edge_a]).astype(np.float64)
    live_b = (~coincident[edge_b]).astype(np.float64)
    g = {
        "a1": a1.astype(np.int32), "b1": b1.astype(np.int32),
        "id_a1a2": np.nan_to_num(idist(ca2, ca1), posinf=0.0) * live_a,
        "id_b1a2": np.nan_to_num(idist(cb1, ca2), posinf=0.0) * live_a,
        "id_b1b2": np.nan_to_num(idist(cb2, cb1), posinf=0.0) * live_b,
        "id_a1b2": np.nan_to_num(idist(ca1, cb2), posinf=0.0) * live_b,
        "live_a": live_a, "live_b": live_b,
        "coincident": coincident,
        "parent": mapping.astype(np.int32),
    }

    # node -> half-edge incidence over the [val_a (Ei) | val_b (Ei)]
    # stream, ELL-padded with slot 2*Ei (a zero pad entry)
    n = fine_coords.shape[0]
    dest = np.concatenate([edge_a, edge_b]).astype(np.int64)
    counts = np.bincount(dest, minlength=n)
    width = max(1, int(counts.max()))
    slots = np.full((n, width), 2 * ei, np.int32)
    mask = np.zeros((n, width))
    order = np.argsort(dest, kind="stable")
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    lane = np.arange(dest.shape[0]) - starts[dest[order]]
    slots[dest[order], lane] = order.astype(np.int32)
    mask[dest[order], lane] = 1.0
    g["slots"] = slots
    g["mask"] = mask
    return g


def build_prolong_shift(fine_coords, coarse_coords, mapping,
                        edge_a, edge_b, max_deltas: int = 16,
                        min_density: float = 0.01):
    """Span-dense prolongation tables.

    Identity: for an edge (r, r+delta), rc[mapping[r+delta]] is just a
    delta-SHIFT of G = rc[mapping]. So after ONE gather of the (small)
    coarse residual table, every covered span's contribution is dense
    slice arithmetic with precomputed inverse-distance diagonals:

      acc[:N-d] += A1_d * G[:N-d] + B1_d * G[d:]      (into a-nodes)
      acc[d:]   += BS_d * G[d:]                        (into b-nodes;
                  the reference's a1->b2 quirk keeps rc[b1] here)

    Rare spans spill to a small indexed stream. Returns a dict of numpy
    arrays; see prolong_shift for runtime."""
    import numpy as np

    n = fine_coords.shape[0]
    coincident = np.all(fine_coords == coarse_coords[mapping], axis=1)

    def idist(p, q):
        d = p - q
        with np.errstate(divide="ignore"):
            out = 1.0 / np.sqrt((d * d).sum(axis=1))
        return np.nan_to_num(out, posinf=0.0, neginf=0.0)

    span = edge_b.astype(np.int64) - edge_a.astype(np.int64)
    # reversed edges (a > b; possible after renumbering) cannot be
    # direction-normalised here — prolongation is endpoint-asymmetric
    # (the a1->b2 quirk) — so they go to the spill path untouched
    pos = span > 0
    cnt = np.bincount(np.where(pos, span, 0))
    chosen = [int(d) for d in np.argsort(cnt)[::-1][:max_deltas]
              if d > 0 and cnt[d] >= max(1, min_density * n)]

    covered = np.zeros(span.shape[0], dtype=bool)
    covered[~pos] = False  # (explicit: negative spans always spill)
    per_delta = []
    for d in chosen:
        sel = np.flatnonzero((span == d) & ~covered)
        # dedup duplicate (a, delta) rows: first wins, rest spill
        first = np.zeros(n - d, dtype=bool)
        keep = []
        for i in sel:
            r = edge_a[i]
            if first[r]:
                continue
            first[r] = True
            keep.append(i)
        keep = np.array(keep, dtype=np.int64)
        covered[keep] = True
        r = edge_a[keep].astype(np.int64)
        a1c = coarse_coords[mapping[r]]
        b1c = coarse_coords[mapping[r + d]]
        a2c = fine_coords[r]
        b2c = fine_coords[r + d]
        la = (~coincident[r]).astype(np.float64)
        lb = (~coincident[r + d]).astype(np.float64)
        A1 = np.zeros(n - d); B1 = np.zeros(n - d); BS = np.zeros(n - d)
        WA = np.zeros(n - d); WB = np.zeros(n - d)
        A1[r] = la * idist(a2c, a1c)
        B1[r] = la * idist(b1c, a2c)
        BS[r] = lb * (idist(b2c, b1c) + idist(a1c, b2c))
        WA[r] = A1[r] + B1[r]
        WB[r] = BS[r]
        per_delta.append((d, A1, B1, BS, WA, WB))

    spill = np.flatnonzero(~covered)
    sg = build_prolong_tables(fine_coords, coarse_coords, mapping,
                              edge_a[spill], edge_b[spill]) \
        if spill.size else None

    # Collapsed, slice-update-free runtime tables. acc[i] receives
    # A1_d[i]*G[i] (i<n-d), B1_d[i]*G[i+d] (i<n-d) and BS_d[i-d]*G[i]
    # (i>=d): the A1 and BS diagonals multiply G at the OUTPUT index, so
    # they merge across all deltas into ONE dense vector C; only the B1
    # terms need shifted reads of G (right-padded, which fuses under an
    # add root — no .at[slice].add dynamic-update-slice/scatter chain,
    # which xprof measured at ~3 ms/cycle on the 7.26M-edge capacity
    # box). wsum is data-independent and folds to a constant here,
    # including the spill edges' weights.
    C = np.zeros(n)
    wsum0 = np.zeros(n)
    b1_deltas = []
    for d, A1, B1, BS, WA, WB in per_delta:
        C[:n - d] += A1
        C[d:] += BS
        wsum0[:n - d] += WA
        wsum0[d:] += WB
        b1_deltas.append((d, B1))
    if sg is not None:
        np.add.at(wsum0, edge_a[spill], sg["id_a1a2"] + sg["id_b1a2"])
        np.add.at(wsum0, edge_b[spill], sg["id_b1b2"] + sg["id_a1b2"])
    # Coincident fine nodes take wavg = G directly; every neighbor
    # weight is already zero there (the la/lb live factors above), so
    # folding cdiag=1, winv=1 at those rows turns the runtime
    # `where(coincident, G, acc/safe)` select + divide into one
    # multiply: wavg = acc * winv.
    with np.errstate(divide="ignore"):
        winv = np.where(wsum0 > 0, 1.0 / np.where(wsum0 > 0, wsum0, 1.0),
                        1.0)
    winv[coincident] = 1.0
    C[coincident] = 1.0
    return {"per_delta": per_delta, "spill": sg,
            "cdiag": C, "b1_deltas": b1_deltas, "winv": winv,
            "coincident": coincident, "parent": mapping.astype(np.int32)}


def prolong_shift(res_coarse, res_fine, vars_fine, t, transposed=False):
    """Runtime of build_prolong_shift. When `transposed`, res_fine and
    vars_fine are (5, N) and the result is (5, N); res_coarse is always
    node-major (coarse levels are small)."""
    collapsed = "cdiag" in t   # slice-update-free formulation (see
    #                            build_prolong_shift; legacy dicts keep
    #                            the per-delta slice-add loop)
    if transposed:
        if "structured" in t:
            G = t_structured_upsample(res_coarse, *t["structured"])
        else:
            G = res_coarse[t["parent"]].T       # the ONE gather, (5, N)
        n = vars_fine.shape[1]
        if collapsed:
            zero = jnp.zeros((), G.dtype)
            acc = t["cdiag"][None] * G
            for d, B1 in t["b1_deltas"]:
                acc = acc + jax.lax.pad(B1[None] * G[:, d:], zero,
                                        ((0, 0, 0), (0, d, 0)))
            if t["spill"] is not None:
                acc = acc + _prolong_spill(res_coarse, t["spill"])[0].T
            return vars_fine + (res_fine - acc * t["winv"][None])
        else:
            acc = jnp.zeros_like(vars_fine)
            wsum = jnp.zeros((n,), vars_fine.dtype)
            for d, A1, B1, BS, WA, WB in t["per_delta"]:
                ga, gb = G[:, :n - d], G[:, d:]
                acc = acc.at[:, :n - d].add(A1[None] * ga + B1[None] * gb)
                acc = acc.at[:, d:].add(BS[None] * gb)
                wsum = wsum.at[:n - d].add(WA)
                wsum = wsum.at[d:].add(WB)
            if t["spill"] is not None:
                sp = _prolong_spill(res_coarse, t["spill"])
                acc = acc + sp[0].T
                wsum = wsum + sp[1]
        safe = jnp.where(wsum > 0, wsum, jnp.ones_like(wsum))
        wavg = jnp.where(t["coincident"][None, :], G, acc / safe[None])
        return vars_fine + (res_fine - wavg)
    if "structured" in t:
        G = structured_upsample(res_coarse, *t["structured"])
    else:
        G = res_coarse[t["parent"]]             # (N, 5) — the ONE gather
    n = vars_fine.shape[0]
    if collapsed:
        zero = jnp.zeros((), G.dtype)
        acc = t["cdiag"][:, None] * G
        for d, B1 in t["b1_deltas"]:
            acc = acc + jax.lax.pad(B1[:, None] * G[d:], zero,
                                    ((0, d, 0), (0, 0, 0)))
        if t["spill"] is not None:
            acc = acc + _prolong_spill(res_coarse, t["spill"])[0]
        return vars_fine + (res_fine - acc * t["winv"][:, None])
    else:
        acc = jnp.zeros_like(vars_fine)
        wsum = jnp.zeros((n,), vars_fine.dtype)
        for d, A1, B1, BS, WA, WB in t["per_delta"]:
            ga, gb = G[:n - d], G[d:]
            acc = acc.at[:n - d].add(A1[:, None] * ga + B1[:, None] * gb)
            acc = acc.at[d:].add(BS[:, None] * gb)
            wsum = wsum.at[:n - d].add(WA)
            wsum = wsum.at[d:].add(WB)
        if t["spill"] is not None:
            sp = _prolong_spill(res_coarse, t["spill"])
            acc = acc + sp[0]
            wsum = wsum + sp[1]
    safe = jnp.where(wsum > 0, wsum, jnp.ones_like(wsum))
    wavg = jnp.where(t["coincident"][:, None], G, acc / safe[:, None])
    return vars_fine + (res_fine - wavg)


def _prolong_spill(res_coarse, g):
    """Accumulate the rare-span remainder through the ELL tables of
    build_prolong_tables; returns (acc (N,5), wsum (N,))."""
    r_a1 = res_coarse[g["a1"]]
    r_b1 = res_coarse[g["b1"]]
    val_a = g["id_a1a2"][:, None] * r_a1 + g["id_b1a2"][:, None] * r_b1
    w_a = g["id_a1a2"] + g["id_b1a2"]
    val_b = (g["id_b1b2"] + g["id_a1b2"])[:, None] * r_b1
    w_b = g["id_b1b2"] + g["id_a1b2"]
    dt = res_coarse.dtype
    stream_v = jnp.concatenate(
        [val_a, val_b, jnp.zeros((1, val_a.shape[1]), dt)], axis=0)
    stream_w = jnp.concatenate([w_a, w_b, jnp.zeros((1,), dt)], axis=0)
    mask = g["mask"].astype(dt)
    n, d = g["slots"].shape
    flat = g["slots"].reshape(-1)            # 1D-index gathers: see
    sv = stream_v[flat].reshape(n, d, -1)    # mg_restrict_gather note
    sw = stream_w[flat].reshape(n, d)
    acc = jnp.einsum("ndv,nd->nv", sv, mask)
    wsum = jnp.einsum("nd,nd->n", sw, mask)
    return acc, wsum


def prolong_gather(res_coarse, res_fine, vars_fine, g):
    """prolong_residuals_interpolate with the edge scatter replaced by a
    fixed-width node gather over precomputed tables (build_prolong_tables).
    Bit-compatible up to FP reassociation with the scatter version."""
    r_a1 = res_coarse[g["a1"]]
    r_b1 = res_coarse[g["b1"]]
    val_a = (g["id_a1a2"][:, None] * r_a1
             + g["id_b1a2"][:, None] * r_b1)
    w_a = g["id_a1a2"] + g["id_b1a2"]
    val_b = (g["id_b1b2"] + g["id_a1b2"])[:, None] * r_b1
    w_b = g["id_b1b2"] + g["id_a1b2"]

    dt = vars_fine.dtype
    stream_v = jnp.concatenate(
        [val_a, val_b, jnp.zeros((1, val_a.shape[1]), dt)], axis=0)
    stream_w = jnp.concatenate(
        [w_a, w_b, jnp.zeros((1,), dt)], axis=0)
    mask = g["mask"].astype(dt)
    n, d = g["slots"].shape
    flat = g["slots"].reshape(-1)
    acc = jnp.einsum("ndv,nd->nv", stream_v[flat].reshape(n, d, -1), mask)
    wsum = jnp.einsum("nd,nd->n", stream_w[flat].reshape(n, d), mask)

    safe_w = jnp.where(wsum > 0, wsum, jnp.ones_like(wsum))
    wavg = jnp.where(g["coincident"][:, None], res_coarse[g["parent"]],
                     acc / safe_w[:, None])
    return vars_fine + (res_fine - wavg)
