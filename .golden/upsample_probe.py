"""Measure t_structured_upsample formulations on the real chip.

Isolated-op wall timing lies through the tunnel; use xprof device
self-time over a fori_loop of chained applications instead.

PYTHONPATH=/root/repo:/root/.axon_site python .golden/upsample_probe.py
"""
import glob
import json
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

NV = 5
CD = (34, 32, 35)
FD = (68, 64, 70)
REPS = 100


def current_form(c_t, fdims, cdims):
    cnx, cny, cnz = cdims
    fnx, fny, fnz = fdims
    nv = c_t.shape[0]
    c = c_t.reshape(nv, cnx, cny, cnz)
    up = jnp.broadcast_to(c[:, :, None, :, None, :, None],
                          (nv, cnx, 2, cny, 2, cnz, 2)
                          ).reshape(nv, 2 * cnx, 2 * cny, 2 * cnz)
    return up[:, :fnx, :fny, :fnz].reshape(nv, fnx * fny * fnz)


def matmul_z(c_t, fdims, cdims, D):
    """x,y duplication by broadcast (outer dims, contiguous copies);
    z (lane-interleaving) by 0/1 duplication matmul — exact."""
    cnx, cny, cnz = cdims
    fnx, fny, fnz = fdims
    nv = c_t.shape[0]
    c = c_t.reshape(nv, cnx, cny, cnz)
    cz = jnp.einsum("vxyz,zf->vxyf", c, D,
                    precision=jax.lax.Precision.HIGHEST)  # (nv,cnx,cny,fnz)
    up = jnp.broadcast_to(cz[:, :, None, :, None, :],
                          (nv, cnx, 2, cny, 2, fnz)
                          ).reshape(nv, 2 * cnx, 2 * cny, fnz)
    return up[:, :fnx, :fny].reshape(nv, fnx * fny * fnz)


def matmul_yz(c_t, fdims, cdims, DYZ):
    cnx, cny, cnz = cdims
    fnx, fny, fnz = fdims
    nv = c_t.shape[0]
    c = c_t.reshape(nv, cnx, cny * cnz)
    cyz = jnp.einsum("vxk,kf->vxf", c, DYZ,
                     precision=jax.lax.Precision.HIGHEST)
    up = jnp.broadcast_to(cyz[:, :, None, :],
                          (nv, cnx, 2, fny * fnz)
                          ).reshape(nv, 2 * cnx, fny * fnz)
    return up[:, :fnx].reshape(nv, fnx * fny * fnz)


def dup_matrix(cn, fn):
    D = np.zeros((cn, fn), np.float32)
    for k in range(cn):
        for i in (0, 1):
            if 2 * k + i < fn:
                D[k, 2 * k + i] = 1.0
    return jnp.asarray(D)


def dup_matrix_yz(cdims, fdims):
    cny, cnz = cdims[1], cdims[2]
    fny, fnz = fdims[1], fdims[2]
    D = np.zeros((cny * cnz, fny * fnz), np.float32)
    for y in range(cny):
        for z in range(cnz):
            for i in (0, 1):
                for j in (0, 1):
                    fy, fz = 2 * y + i, 2 * z + j
                    if fy < fny and fz < fnz:
                        D[y * cnz + z, fy * fnz + fz] = 1.0
    return jnp.asarray(D)


def main():
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.random((NV, CD[0] * CD[1] * CD[2])), jnp.float32)
    Dz = dup_matrix(CD[2], FD[2])
    Dyz = dup_matrix_yz(CD, FD)

    ref = np.asarray(current_form(c, FD, CD))
    for name, f in (("matmul_z", lambda x: matmul_z(x, FD, CD, Dz)),
                    ("matmul_yz", lambda x: matmul_yz(x, FD, CD, Dyz))):
        out = np.asarray(jax.jit(f)(c))
        exact = np.array_equal(out, ref)
        print(f"{name}: exact={exact}")
        assert exact, name

    # chained loops so the tunnel can't fake-cache; xprof attributes time
    def loop(form, extra, name):
        def body(i, x):
            g = form(x, FD, CD, *extra)
            # fold a cheap reduction of g back into x to chain
            return x + 1e-30 * g[:, :x.shape[1]]

        def run(x):
            return jax.lax.fori_loop(0, REPS, body, x)
        run.__name__ = name
        return jax.jit(run)

    fns = {
        "current": loop(current_form, (), "cur"),
        "matmul_z": loop(matmul_z, (Dz,), "mmz"),
        "matmul_yz": loop(matmul_yz, (Dyz,), "mmyz"),
    }
    for name, fn in fns.items():
        np.asarray(fn(c).ravel()[:4])   # warm/compile

    out = tempfile.mkdtemp(prefix="upsample_")
    with jax.profiler.trace(out):
        for name, fn in fns.items():
            np.asarray(fn(c).ravel()[:4])

    from xprof.convert import raw_to_tool_data as r2t
    paths = sorted(glob.glob(f"{out}/**/*.xplane.pb", recursive=True))
    data, _ = r2t.xspace_to_tool_data(paths, "framework_op_stats", {})
    tbl = json.loads(data)[0]
    cols = [c_["label"] for c_ in tbl["cols"]]
    rows = [dict(zip(cols, [cc.get("v") for cc in r["c"]]))
            for r in tbl["rows"]]
    dev = [r for r in rows if r["Host/device"] == "Device"]
    tot = sum(r["Total self-time (us)"] for r in dev)
    print(f"device total {tot/1e3:.2f} ms over 3x{REPS} applications")
    for r in dev[:16]:
        print(f"{r['Total self-time (us)']/REPS:8.2f} us/apply "
              f"x{int(r['#Occurrences']):<5} {r['Operation Type']:<18} "
              f"bw={r['Measured Memory BW (GBytes/Sec)']:.0f}GB/s "
              f"{str(r['Operation Name'])[:60]}")


if __name__ == "__main__":
    main()
