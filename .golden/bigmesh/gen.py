import os, time
from mgcfd_tpu.bench.flagship import FlagshipSpec, flagship_mesh
from mgcfd_tpu.mesh import write_grid_dat, write_input_dat, write_mg_connectivity
out = os.path.dirname(os.path.abspath(__file__))
mesh = flagship_mesh(FlagshipSpec(nx=136, ny=128, nz=140, num_levels=4))
files, mgs = [], []
for i, lvl in enumerate(mesh.levels):
    t0=time.time(); write_grid_dat(f"{out}/level{i}.dat", lvl, mesh.variant)
    print(f"level{i} written {time.time()-t0:.0f}s", flush=True)
    files.append(f"level{i}.dat")
    if lvl.mg_mapping is not None:
        write_mg_connectivity(f"{out}/mg{i}.dat", lvl.mg_mapping)
        mgs.append(f"mg{i}.dat")
write_input_dat(f"{out}/input.dat", mesh, files, mgs)
print("done")
