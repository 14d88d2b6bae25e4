"""Binary mesh cache.

The reference converts ASCII meshes to hostname-suffixed .bin files for
fast reload (io_enhanced.cpp:19-24, :203-405) and makes that the default
fast path on every driver load (euler3d_cpu_double.cpp:176-230). The
TPU-native equivalent is an .npz sidecar of the already-classified
arrays — including the MG connectivity — keyed by the source files'
mtimes (no hostname games: npz is portable, and corruption manifests as
a load failure which falls back to the parser — same contract as
read_grid_from_bin returning false)."""
from __future__ import annotations

import os

import numpy as np

from ..core.constants import MeshVariant
from ..core.types import MeshLevel

CACHE_DIR_NAME = ".meshcache"
_FORMAT = 2  # bump to invalidate old caches


def _cache_path(path: str) -> str:
    d = os.path.join(os.path.dirname(os.path.abspath(path)), CACHE_DIR_NAME)
    return os.path.join(d, os.path.basename(path) + ".npz")


def _try_load(cpath: str, src_mtime: float, mg_mtime: float,
              variant: MeshVariant, need_coords: bool):
    if not os.path.exists(cpath):
        return None
    try:
        z = np.load(cpath, allow_pickle=False)
        if int(z["format"]) != _FORMAT \
                or float(z["src_mtime"]) != src_mtime \
                or float(z["mg_mtime"]) != mg_mtime \
                or str(z["variant"]) != variant.value:
            return None
        coords = z["coords"] if z["coords"].size else None
        if need_coords and coords is None:
            # cached by a coords-free load; the parser must run again
            return None
        mg = z["mg_mapping"] if z["mg_mapping"].size else None
        return MeshLevel(
            volumes=z["volumes"], coords=coords,
            edge_a=z["edge_a"], edge_b=z["edge_b"],
            edge_w=z["edge_w"],
            bedge_b=z["bedge_b"], bedge_w=z["bedge_w"],
            wedge_b=z["wedge_b"], wedge_w=z["wedge_w"],
            mg_mapping=mg)
    except Exception:
        return None  # corrupt cache -> re-parse (read_grid_from_bin contract)


def load_mesh_cached(path: str, variant: MeshVariant,
                     need_coords: bool = True,
                     mg_path: str | None = None) -> MeshLevel:
    """Load one mesh level (and optionally its MG connectivity) through
    the npz cache; parse-and-write-back on miss."""
    from .io_dat import read_grid_dat, read_mg_connectivity

    cpath = _cache_path(path)
    src_mtime = os.path.getmtime(path)
    mg_mtime = os.path.getmtime(mg_path) if mg_path else 0.0
    lvl = _try_load(cpath, src_mtime, mg_mtime, variant, need_coords)
    if lvl is not None:
        return lvl
    lvl = read_grid_dat(path, variant, need_coords=need_coords)
    if mg_path:
        lvl.mg_mapping = read_mg_connectivity(mg_path)
    try:
        os.makedirs(os.path.dirname(cpath), exist_ok=True)
        np.savez(cpath,
                 format=_FORMAT,
                 src_mtime=src_mtime, mg_mtime=mg_mtime,
                 variant=variant.value,
                 volumes=lvl.volumes,
                 coords=lvl.coords if lvl.coords is not None
                 else np.zeros(0),
                 edge_a=lvl.edge_a, edge_b=lvl.edge_b, edge_w=lvl.edge_w,
                 bedge_b=lvl.bedge_b, bedge_w=lvl.bedge_w,
                 wedge_b=lvl.wedge_b, wedge_w=lvl.wedge_w,
                 mg_mapping=lvl.mg_mapping if lvl.mg_mapping is not None
                 else np.zeros(0, dtype=np.int64))
    except OSError:
        pass
    return lvl
