"""ctypes bindings + on-demand build of the native mesh parser.

The shared library is compiled once per checkout (g++ -O3 -shared) into
native/_build/ and loaded via ctypes; if the toolchain is unavailable the
callers fall back to the pure-Python parser (mesh/io_dat.py) — same
semantics, ~20x slower on million-edge meshes.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_HERE, "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libmgcfd_native.so")
_SRC = os.path.join(_HERE, "mesh_parser.cpp")
_SRC_PACK = os.path.join(_HERE, "window_pack.cpp")

_lock = threading.Lock()
_lib = None
_build_failed = False


class _ParsedMesh(ctypes.Structure):
    _fields_ = [
        ("num_nodes", ctypes.c_int64),
        ("num_internal", ctypes.c_int64),
        ("num_boundary", ctypes.c_int64),
        ("num_wall", ctypes.c_int64),
        ("volumes", ctypes.POINTER(ctypes.c_double)),
        ("edge_a", ctypes.POINTER(ctypes.c_int32)),
        ("edge_b", ctypes.POINTER(ctypes.c_int32)),
        ("edge_w", ctypes.POINTER(ctypes.c_double)),
        ("bedge_b", ctypes.POINTER(ctypes.c_int32)),
        ("bedge_w", ctypes.POINTER(ctypes.c_double)),
        ("wedge_b", ctypes.POINTER(ctypes.c_int32)),
        ("wedge_w", ctypes.POINTER(ctypes.c_double)),
        ("claimed_edges", ctypes.c_int64),
    ]


def _ensure_built():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH)
                    < max(os.path.getmtime(_SRC),
                          os.path.getmtime(_SRC_PACK))):
                os.makedirs(_BUILD_DIR, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, _SRC_PACK,
                     "-o", _LIB_PATH],
                    check=True, capture_output=True, timeout=300)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.mgcfd_last_error.restype = ctypes.c_char_p
            lib.mgcfd_last_error.argtypes = []
            lib.mgcfd_parse_dat.restype = ctypes.POINTER(_ParsedMesh)
            lib.mgcfd_parse_dat.argtypes = [ctypes.c_char_p, ctypes.c_int]
            lib.mgcfd_parse_coords.restype = ctypes.c_int
            lib.mgcfd_parse_coords.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64]
            lib.mgcfd_parse_mg.restype = ctypes.c_int64
            lib.mgcfd_parse_mg.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64]
            lib.mgcfd_free_mesh.argtypes = [ctypes.POINTER(_ParsedMesh)]
            i32p = ctypes.POINTER(ctypes.c_int32)
            i64p = ctypes.POINTER(ctypes.c_int64)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.mgcfd_pack_halfedges.restype = ctypes.c_int64
            lib.mgcfd_pack_halfedges.argtypes = [
                ctypes.c_int64, i64p, i32p, i32p, i32p, i32p, i32p,
                i32p, u8p, i64p, u8p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, i32p, i32p, i32p, i32p, i32p]
            _lib = lib
        except Exception:
            _build_failed = True
        return _lib


def native_available() -> bool:
    return _ensure_built() is not None


def _copy(ptr, count, dtype):
    if count == 0:
        return np.zeros(0 if dtype != np.float64 else 0, dtype=dtype)
    return np.ctypeslib.as_array(ptr, shape=(count,)).astype(dtype,
                                                            copy=True)


def parse_dat_native(path: str, flip_all: bool, need_coords: bool):
    """-> MeshLevel or None if the native library is unavailable."""
    lib = _ensure_built()
    if lib is None:
        return None
    from ..core.types import MeshLevel

    from ..mesh.io_dat import MeshFormatError, _warn_edge_mismatch

    pm = lib.mgcfd_parse_dat(path.encode(), 1 if flip_all else 0)
    if not pm:
        msg = lib.mgcfd_last_error().decode() or \
            f"{path}: native parser failed"
        if "cannot read file" in msg:
            # unreadable vs malformed: same split as the Python path
            # (open() raises OSError; parse errors raise MeshFormatError)
            raise IOError(msg)
        raise MeshFormatError(msg)
    try:
        m = pm.contents
        ei, eb, ew = m.num_internal, m.num_boundary, m.num_wall
        claimed = m.claimed_edges
        lvl = MeshLevel(
            volumes=_copy(m.volumes, m.num_nodes, np.float64),
            coords=None,
            edge_a=_copy(m.edge_a, ei, np.int32),
            edge_b=_copy(m.edge_b, ei, np.int32),
            edge_w=_copy(m.edge_w, 3 * ei, np.float64).reshape(ei, 3),
            bedge_b=_copy(m.bedge_b, eb, np.int32),
            bedge_w=_copy(m.bedge_w, 3 * eb, np.float64).reshape(eb, 3),
            wedge_b=_copy(m.wedge_b, ew, np.int32),
            wedge_w=_copy(m.wedge_w, 3 * ew, np.float64).reshape(ew, 3),
        )
    finally:
        lib.mgcfd_free_mesh(pm)
    _warn_edge_mismatch(path, claimed, lvl.num_edges)

    coords_path = path + ".coords"
    if need_coords and os.path.exists(coords_path):
        coords = np.empty((lvl.num_nodes, 3), np.float64)
        rc = lib.mgcfd_parse_coords(
            coords_path.encode(),
            coords.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            lvl.num_nodes)
        if rc != 0:
            raise MeshFormatError(
                f"{coords_path}: expected {lvl.num_nodes} 'x y z' rows")
        lvl.coords = coords
    return lvl


def pack_halfedges_native(order, ow, lw, o_row, o_lane, g_row, g_lane,
                          in_range, pair_id, npair,
                          n_win, kw, l_cap, S):
    """Native first-fit packer (prep/window.build_halfedge_plan hot
    loop, bit-identical). Returns (placement, place_src, layer_count,
    layer_wins, nsrc_used, pair_ok) or None when the toolchain is
    unavailable."""
    lib = _ensure_built()
    if lib is None:
        return None
    H = order.shape[0]
    i32 = lambda a: np.ascontiguousarray(a, np.int32)   # noqa: E731
    order = np.ascontiguousarray(order, np.int64)
    ow, lw = i32(ow), i32(lw)
    o_row, o_lane, g_row, g_lane = (i32(o_row), i32(o_lane), i32(g_row),
                                    i32(g_lane))
    in_range = np.ascontiguousarray(in_range, np.uint8)
    has_pair = pair_id is not None
    if has_pair:
        pair_id = np.ascontiguousarray(pair_id, np.int64)
        pair_ok = np.ones(max(1, npair), np.uint8)
        # pairs with an out-of-range member are dead before the loop
        # (the Python reference pre-marks them)
        pair_ok[pair_id[in_range == 0]] = 0
    else:
        pair_ok = np.ones(1, np.uint8)
    placement = np.full(H, -1, np.int32)
    place_src = np.zeros(H, np.int32)
    layer_count = np.zeros(n_win, np.int32)
    layer_wins = np.zeros((n_win, l_cap, S), np.int32)
    nsrc_used = np.zeros((n_win, l_cap), np.int32)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.mgcfd_pack_halfedges(
        H, p(order, ctypes.c_int64), p(ow, ctypes.c_int32),
        p(lw, ctypes.c_int32), p(o_row, ctypes.c_int32),
        p(o_lane, ctypes.c_int32), p(g_row, ctypes.c_int32),
        p(g_lane, ctypes.c_int32), p(in_range, ctypes.c_uint8),
        p(pair_id, ctypes.c_int64) if has_pair else None,
        p(pair_ok, ctypes.c_uint8),
        n_win, kw, l_cap, S,
        p(placement, ctypes.c_int32), p(place_src, ctypes.c_int32),
        p(layer_count, ctypes.c_int32), p(layer_wins, ctypes.c_int32),
        p(nsrc_used, ctypes.c_int32))
    return (placement, place_src, layer_count, layer_wins, nsrc_used,
            pair_ok.astype(bool) if has_pair else None)


def parse_mg_native(path: str):
    lib = _ensure_built()
    if lib is None:
        return None
    from ..mesh.io_dat import MeshFormatError

    count = lib.mgcfd_parse_mg(path.encode(), None, 0)
    if count < 0:
        raise MeshFormatError(
            f"{path}: malformed or truncated mg connectivity")
    out = np.empty(count, np.int64)
    got = lib.mgcfd_parse_mg(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        count)
    if got != count:
        raise MeshFormatError(
            f"{path}: malformed or truncated mg connectivity")
    return out
