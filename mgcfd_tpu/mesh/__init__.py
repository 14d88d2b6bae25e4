from .build import build_edges_from_adjacency, apply_ewt_conditioning
from .generate import generate_box_mesh, generate_multigrid_box
from .io_dat import (
    read_grid_dat,
    write_grid_dat,
    read_mg_connectivity,
    write_mg_connectivity,
    read_input_dat,
    write_input_dat,
    load_multigrid_mesh,
)
from .duplicate import duplicate_mesh
from .cache import load_mesh_cached

__all__ = [
    "build_edges_from_adjacency", "apply_ewt_conditioning",
    "generate_box_mesh", "generate_multigrid_box",
    "read_grid_dat", "write_grid_dat", "read_mg_connectivity",
    "write_mg_connectivity", "read_input_dat", "write_input_dat",
    "load_multigrid_mesh", "duplicate_mesh", "load_mesh_cached",
]
