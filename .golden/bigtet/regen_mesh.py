"""Regenerate ONLY .golden/bigtet/mesh.pkl (wiped between rounds).
Deterministic (seed=1) — identical to the hierarchy gen.py produced;
skips the .dat write + reference-binary rerun (CPU baselines for this
dataset are already recorded in BASELINE.md from refout*/)."""
import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
from mgcfd_tpu.mesh.unstructured import generate_unstructured_hierarchy
from mgcfd_tpu.prep.renumber import renumber_hierarchy

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
print("mesh.pkl written", flush=True)
