"""Checkpoint / resume of solver state.

The reference has no resume path; its closest artefacts are the text
array dumps, which happen to round-trip (SURVEY 5.4). Here checkpointing
is a first-class capability: an .npz snapshot of the full per-level state
(variables + residuals), the cycle counter, and a mesh/config fingerprint
that refuses to resume onto a different problem.
"""
from __future__ import annotations

import glob
import hashlib
import os

import numpy as np


def _fingerprint(mesh) -> str:
    h = hashlib.sha256()
    h.update(mesh.variant.value.encode())
    for lvl in mesh.levels:
        h.update(np.int64([lvl.num_nodes, lvl.num_internal_edges,
                           lvl.num_boundary_edges,
                           lvl.num_wall_edges]).tobytes())
        h.update(np.ascontiguousarray(lvl.volumes[:64]).tobytes())
    return h.hexdigest()[:16]


def save_checkpoint(directory: str, mesh, state: dict, cycle: int,
                    rms_history=None) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"ckpt-{cycle:06d}.npz")
    payload = {
        "cycle": np.int64(cycle),
        "fingerprint": np.bytes_(_fingerprint(mesh).encode()),
        "num_levels": np.int64(len(state["variables"])),
        "rms_history": np.asarray(rms_history if rms_history is not None
                                  else [], dtype=np.float64),
    }
    for i, (v, r) in enumerate(zip(state["variables"],
                                   state["residuals"])):
        payload[f"variables_{i}"] = np.asarray(v)
        payload[f"residuals_{i}"] = np.asarray(r)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)
    return path


def latest_checkpoint(directory: str) -> str | None:
    paths = sorted(glob.glob(os.path.join(directory, "ckpt-*.npz")))
    return paths[-1] if paths else None


def load_checkpoint(path: str, mesh, dtype):
    """-> (state, cycle, rms_history). Raises on mesh mismatch."""
    import jax.numpy as jnp

    z = np.load(path, allow_pickle=False)
    fp = bytes(z["fingerprint"]).decode()
    want = _fingerprint(mesh)
    if fp != want:
        raise ValueError(
            f"checkpoint {path} was written for a different problem "
            f"(fingerprint {fp} != {want})")
    L = int(z["num_levels"])
    state = {
        "variables": [jnp.asarray(z[f"variables_{i}"], dtype)
                      for i in range(L)],
        "residuals": [jnp.asarray(z[f"residuals_{i}"], dtype)
                      for i in range(L)],
    }
    return state, int(z["cycle"]), list(z["rms_history"])
