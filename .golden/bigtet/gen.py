"""Tet CAPACITY dataset: unstructured hierarchy at ~8M edges finest
(104x98x107 seeds, 4 levels — the tetrahedral counterpart of
.golden/bigmesh's 136x128x140 box capacity point), RCM-renumbered,
written in the reference .dat format + reference binary run (3 cycles,
same policy as the box capacity measurement in BASELINE.md)."""
import os
import pickle
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
from mgcfd_tpu.mesh.unstructured import generate_unstructured_hierarchy
from mgcfd_tpu.prep.renumber import renumber_hierarchy
from mgcfd_tpu.mesh import (write_grid_dat, write_input_dat,
                            write_mg_connectivity)

D = os.path.dirname(os.path.abspath(__file__))

t0 = time.time()
mesh = generate_unstructured_hierarchy(104, 98, 107, 4, seed=1)
print("gen", round(time.time() - t0, 1), flush=True)
t0 = time.time()
mesh = renumber_hierarchy(mesh)
print("rcm", round(time.time() - t0, 1), flush=True)
for i, l in enumerate(mesh.levels):
    print(f"  L{i}: {l.num_nodes} nodes {l.num_internal_edges} edges",
          flush=True)
pickle.dump(mesh, open(os.path.join(D, "mesh.pkl"), "wb"))

t0 = time.time()
files, mgs = [], []
for i, lvl in enumerate(mesh.levels):
    write_grid_dat(os.path.join(D, f"level{i}.dat"), lvl, mesh.variant,
                   write_coords=True)
    files.append(f"level{i}.dat")
    if lvl.mg_mapping is not None:
        write_mg_connectivity(os.path.join(D, f"mg{i}.dat"),
                              lvl.mg_mapping)
        mgs.append(f"mg{i}.dat")
write_input_dat(os.path.join(D, "input.dat"), mesh, files, mgs)
print("write", round(time.time() - t0, 1), flush=True)

BIN = ("/root/repo/.golden/refbuild/bin/"
       "euler3d_cpu_double_gnu-DTIME-DINSN_SET=Host.b")
out = os.path.join(D, "refout")
os.makedirs(out, exist_ok=True)
t0 = time.time()
r = subprocess.run([BIN, "-i", "input.dat", "-d", D, "-o", out + "/",
                    "-g", "3"],
                   capture_output=True, text=True, timeout=7200)
print("reference run", round(time.time() - t0, 1), "rc", r.returncode,
      flush=True)
print(r.stdout[-1500:])
