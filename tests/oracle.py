"""Independent scalar-loop oracle for the MG-CFD numerics.

This is deliberately written as naive per-edge / per-node Python loops in
numpy float64, directly from the documented semantics of the reference
kernels — it shares no code with mgcfd_tpu/ops (which is vectorised JAX).
Property tests compare the two implementations; golden tests compare both
against the reference C++ binary's dumps.
"""
from __future__ import annotations

import math

import numpy as np

GAMMA = 1.4
SMOOTH = float(np.float64(np.float32(0.2)))
RK = 3


def prims(q):
    rho, mx, my, mz, pe = q
    vx, vy, vz = mx / rho, my / rho, mz / rho
    ssq = vx * vx + vy * vy + vz * vz
    p = (GAMMA - 1.0) * (pe - 0.5 * rho * ssq)
    c = math.sqrt(GAMMA * p / rho)
    return (vx, vy, vz), math.sqrt(ssq), p, c


def flux_tensor(q):
    """(3,5): row d = flux in direction d. Momentum entry [d,1+k] =
    vel_k * mom_d + p*delta."""
    rho, mx, my, mz, pe = q
    mom = (mx, my, mz)
    (vx, vy, vz), _, p, _ = prims(q)
    vel = (vx, vy, vz)
    F = np.zeros((3, 5))
    for d in range(3):
        F[d, 0] = mom[d]
        for k in range(3):
            F[d, 1 + k] = vel[k] * mom[d] + (p if d == k else 0.0)
        F[d, 4] = vel[d] * (pe + p)
    return F


def internal_flux_edge(qa, qb, e):
    ewt = math.sqrt(e[0] ** 2 + e[1] ** 2 + e[2] ** 2)
    _, sa, _, ca = prims(qa)
    _, sb, _, cb = prims(qb)
    factor = -ewt * SMOOTH * 0.5 * (sa + sb + ca + cb)
    Fa, Fb = flux_tensor(qa), flux_tensor(qb)
    val = np.zeros(5)
    for v in range(5):
        val[v] = factor * (qa[v] - qb[v])
        for d in range(3):
            val[v] += -0.5 * e[d] * (Fa[d, v] + Fb[d, v])
    return val


def boundary_flux_edge(qb, e):
    _, _, p, _ = prims(qb)
    return np.array([0.0, e[0] * p, e[1] * p, e[2] * p, 0.0])


def wall_flux_edge(qb, e, ff_flux):
    Fb = flux_tensor(qb)
    val = np.zeros(5)
    for v in range(5):
        for d in range(3):
            val[v] += 0.5 * e[d] * (ff_flux[d, v] + Fb[d, v])
    return val


def far_field():
    rho = 1.4
    p = 1.0
    c = math.sqrt(GAMMA * p / rho)
    speed = 1.2 * c
    q = np.array([rho, rho * speed, 0.0, 0.0,
                  rho * 0.5 * speed * speed + p / (GAMMA - 1.0)])
    return q, flux_tensor(q)


def compute_fluxes(lvl, variables, ff_flux):
    n = variables.shape[0]
    fluxes = np.zeros((n, 5))
    for a, b, e in zip(lvl.edge_a, lvl.edge_b, lvl.edge_w):
        val = internal_flux_edge(variables[a], variables[b], e)
        fluxes[a] += val
        fluxes[b] -= val
    for b, e in zip(lvl.bedge_b, lvl.bedge_w):
        fluxes[b] += boundary_flux_edge(variables[b], e)
    for b, e in zip(lvl.wedge_b, lvl.wedge_w):
        fluxes[b] += wall_flux_edge(variables[b], e, ff_flux)
    return fluxes


def step_factor_legacy(variables, volumes):
    out = np.zeros(len(volumes))
    for i in range(len(volumes)):
        _, s, _, c = prims(variables[i])
        out[i] = 0.5 / (math.sqrt(volumes[i]) * (s + c))
    return out


def step_factor(variables, volumes):
    n = len(volumes)
    dt = np.zeros(n)
    for i in range(n):
        _, s, _, c = prims(variables[i])
        dt[i] = 0.5 * (volumes[i] ** (1.0 / 3.0)) / (s + c)
    return np.full(n, dt.min()) / volumes


def visit(lvl, variables, ff_flux, legacy):
    old = variables.copy()
    sf = (step_factor_legacy if legacy else step_factor)(
        variables, lvl.volumes)
    for j in range(RK):
        fluxes = compute_fluxes(lvl, variables, ff_flux)
        variables = old + (sf / (RK + 1 - j))[:, None] * fluxes
    return variables, old, variables - old


def mg_restrict(vars_fine, vars_coarse, mapping):
    out = vars_coarse.copy()
    counts = np.zeros(len(vars_coarse), dtype=np.int64)
    for i in range(len(mapping)):
        if counts[mapping[i]] == 0:
            out[mapping[i]] = 0.0
        out[mapping[i]] += vars_fine[i]
        counts[mapping[i]] += 1
    for i in range(len(out)):
        if counts[i] > 0:
            out[i] /= counts[i]
    return out


def prolong(res_coarse, res_fine, vars_fine, mapping, cc, cf,
            edge_a, edge_b):
    n = len(vars_fine)
    wavg = np.zeros((n, 5))
    wsum = np.zeros(n)
    coincident = np.zeros(n, dtype=bool)
    for i in range(n):
        coincident[i] = bool(np.all(cf[i] == cc[mapping[i]]))

    def idist(p, q):
        d = p - q
        return 1.0 / math.sqrt(d[0] ** 2 + d[1] ** 2 + d[2] ** 2)

    for a2, b2 in zip(edge_a, edge_b):
        a1, b1 = mapping[a2], mapping[b2]
        if coincident[a2]:
            wavg[a2] = res_coarse[a1]
            wsum[a2] = 1.0
        else:
            w1 = idist(cf[a2], cc[a1])
            wavg[a2] += w1 * res_coarse[a1]
            w2 = idist(cc[b1], cf[a2])
            wavg[a2] += w2 * res_coarse[b1]
            wsum[a2] += w1 + w2
        if coincident[b2]:
            wavg[b2] = res_coarse[b1]
            wsum[b2] = 1.0
        else:
            w1 = idist(cf[b2], cc[b1])
            wavg[b2] += w1 * res_coarse[b1]
            w2 = idist(cc[a1], cf[b2])
            # reference quirk: distance to a1, residual of b1
            wavg[b2] += w2 * res_coarse[b1]
            wsum[b2] += w1 + w2
    out = vars_fine.copy()
    for i in range(n):
        w = wavg[i] / wsum[i] if wsum[i] > 0 else np.zeros(5)
        out[i] += res_fine[i] - w
    return out


def run_cycles(mesh, cycles, legacy=None):
    """Full V-cycle walk, mirroring euler3d_cpu_double.cpp:371-694."""
    ff_q, ff_flux = far_field()
    L = len(mesh.levels)
    if legacy is None:
        legacy = mesh.variant.value == "fvcorr"
    variables = [np.tile(ff_q, (l.num_nodes, 1)) for l in mesh.levels]
    residuals = [np.zeros((l.num_nodes, 5)) for l in mesh.levels]
    rms_hist = []
    for _ in range(cycles):
        if L == 1:
            variables[0], old, residuals[0] = visit(
                mesh.levels[0], variables[0], ff_flux, legacy)
            r = residuals[0]
            rms_hist.append(math.sqrt((r * r).sum() / len(r)))
            continue
        for l in range(L - 1):
            variables[l], old, residuals[l] = visit(
                mesh.levels[l], variables[l], ff_flux, legacy)
            if l == 0:
                r = residuals[0]
                rms_hist.append(math.sqrt((r * r).sum() / len(r)))
            variables[l + 1] = mg_restrict(
                variables[l], variables[l + 1], mesh.levels[l].mg_mapping)
        variables[L - 1], old, residuals[L - 1] = visit(
            mesh.levels[L - 1], variables[L - 1], ff_flux, legacy)
        for l in range(L - 2, -1, -1):
            variables[l] = prolong(
                residuals[l + 1], residuals[l], variables[l],
                mesh.levels[l].mg_mapping,
                mesh.levels[l + 1].coords, mesh.levels[l].coords,
                mesh.levels[l].edge_a, mesh.levels[l].edge_b)
            if l > 0:
                variables[l], old, residuals[l] = visit(
                    mesh.levels[l], variables[l], ff_flux, legacy)
    return variables, rms_hist
