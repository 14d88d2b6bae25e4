"""Tet-flagship benchmark dataset: unstructured hierarchy at M6 scale
(305K nodes / 2.28M edges finest, 4 levels), RCM-renumbered, written in
the reference .dat format + reference binary golden run (5 cycles)."""
import os
import pickle
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from mgcfd_tpu.mesh.unstructured import generate_unstructured_hierarchy
from mgcfd_tpu.prep.renumber import renumber_hierarchy
from mgcfd_tpu.mesh import (write_grid_dat, write_input_dat,
                            write_mg_connectivity)

D = os.path.dirname(os.path.abspath(__file__))

t0 = time.time()
mesh = generate_unstructured_hierarchy(68, 64, 70, 4, seed=1)
print("gen", round(time.time() - t0, 1))
t0 = time.time()
mesh = renumber_hierarchy(mesh)
print("rcm", round(time.time() - t0, 1))
for i, l in enumerate(mesh.levels):
    print(f"  L{i}: {l.num_nodes} nodes {l.num_internal_edges} edges")
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
print("write", round(time.time() - t0, 1))

BIN = "/root/repo/.golden/refbuild/bin/euler3d_cpu_double_gnu-DTIME-DINSN_SET=Host.b"
out = os.path.join(D, "refout")
os.makedirs(out, exist_ok=True)
t0 = time.time()
r = subprocess.run([BIN, "-i", "input.dat", "-d", D, "-o", out + "/",
                    "-g", "5", "--output-variables"],
                   capture_output=True, text=True, timeout=3600)
print("reference run", round(time.time() - t0, 1), "rc", r.returncode)
print(r.stdout[-1500:])
