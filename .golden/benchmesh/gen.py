import os, time
import numpy as np
from mgcfd_tpu.bench import flagship_mesh
from mgcfd_tpu.mesh import write_grid_dat, write_input_dat, write_mg_connectivity

out = os.path.dirname(os.path.abspath(__file__))
t0 = time.time()
mesh = flagship_mesh()
print("gen:", time.time() - t0, "s;",
      [(l.num_nodes, l.num_internal_edges) for l in mesh.levels])
files, mgs = [], []
for i, lvl in enumerate(mesh.levels):
    t0 = time.time()
    write_grid_dat(f"{out}/level{i}.dat", lvl, mesh.variant)
    print(f"wrote level{i}", time.time() - t0)
    files.append(f"level{i}.dat")
    if lvl.mg_mapping is not None:
        write_mg_connectivity(f"{out}/mg{i}.dat", lvl.mg_mapping)
        mgs.append(f"mg{i}.dat")
write_input_dat(f"{out}/input.dat", mesh, files, mgs)
print("done")
