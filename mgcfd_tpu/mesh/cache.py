"""Binary mesh cache.

The reference converts ASCII meshes to hostname-suffixed .bin files for
fast reload (io_enhanced.cpp:19-24, :203-405). The TPU-native equivalent
is an .npz sidecar of the already-classified arrays, keyed by source file
mtime (no hostname games: npz is portable, and corruption manifests as a
load failure which falls back to the parser — same contract as
read_grid_from_bin returning false)."""
from __future__ import annotations

import os

import numpy as np

from ..core.constants import MeshVariant
from ..core.types import MeshLevel
from .io_dat import read_grid_dat

CACHE_DIR_NAME = ".meshcache"


def _cache_path(path: str) -> str:
    d = os.path.join(os.path.dirname(os.path.abspath(path)), CACHE_DIR_NAME)
    return os.path.join(d, os.path.basename(path) + ".npz")


def load_mesh_cached(path: str, variant: MeshVariant,
                     need_coords: bool = True) -> MeshLevel:
    cpath = _cache_path(path)
    src_mtime = os.path.getmtime(path)
    if os.path.exists(cpath):
        try:
            z = np.load(cpath, allow_pickle=False)
            if float(z["src_mtime"]) == src_mtime and \
                    str(z["variant"]) == variant.value:
                coords = z["coords"] if z["coords"].size else None
                return MeshLevel(
                    volumes=z["volumes"], coords=coords,
                    edge_a=z["edge_a"], edge_b=z["edge_b"],
                    edge_w=z["edge_w"],
                    bedge_b=z["bedge_b"], bedge_w=z["bedge_w"],
                    wedge_b=z["wedge_b"], wedge_w=z["wedge_w"])
        except Exception:
            pass  # corrupt cache -> re-parse (read_grid_from_bin contract)
    lvl = read_grid_dat(path, variant, need_coords=need_coords)
    try:
        os.makedirs(os.path.dirname(cpath), exist_ok=True)
        np.savez(cpath,
                 src_mtime=src_mtime, variant=variant.value,
                 volumes=lvl.volumes,
                 coords=lvl.coords if lvl.coords is not None
                 else np.zeros(0),
                 edge_a=lvl.edge_a, edge_b=lvl.edge_b, edge_w=lvl.edge_w,
                 bedge_b=lvl.bedge_b, bedge_w=lvl.bedge_w,
                 wedge_b=lvl.wedge_b, wedge_w=lvl.wedge_w)
    except OSError:
        pass
    return lvl
