"""Regenerate the wiped mesh.pkl caches (deterministic seeds — the
datasets the committed refout measurements were made on). Skips the
.dat writes and reference runs; only the pickles profiling/bench need.

PYTHONPATH=/root/repo:/root/.axon_site python .golden/regen_meshes.py
"""
import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
from mgcfd_tpu.mesh.unstructured import generate_unstructured_hierarchy
from mgcfd_tpu.prep.renumber import renumber_hierarchy

G = os.path.dirname(os.path.abspath(__file__))

for sub, dims in (("benchtet", (68, 64, 70)), ("bigtet", (104, 98, 107))):
    path = os.path.join(G, sub, "mesh.pkl")
    if os.path.exists(path):
        print(sub, "already present", flush=True)
        continue
    t0 = time.time()
    mesh = generate_unstructured_hierarchy(*dims, 4, seed=1)
    mesh = renumber_hierarchy(mesh)
    for i, l in enumerate(mesh.levels):
        print(f"  {sub} L{i}: {l.num_nodes} nodes "
              f"{l.num_internal_edges} edges", flush=True)
    pickle.dump(mesh, open(path, "wb"))
    print(sub, round(time.time() - t0, 1), "s", flush=True)
