"""First-class capacity-scale acceptance criterion (VERDICT r03 #7):
small-K fp32-vs-fp64-oracle comparison with a stated tolerance, runnable
as one command. CI exercises the criterion itself at smoke scale; the
real capacity presets are opt-in (hours of fp64 CPU time)."""
import json
import os
import subprocess
import sys

import pytest

from mgcfd_tpu.validate.capacity import PRESETS, _build, acceptance

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_acceptance_smoke_passes():
    mesh = _build("smoke")
    v = acceptance(mesh, cycles=2)
    assert v["accepted"], v
    assert v["rms_finite_fp32"]
    assert v["max_rel_fp32_vs_fp64"] <= 5e-7
    # the synthetic start state is at roundoff equilibrium: the RMS
    # clause must have recognised that and not compared dtype noise
    assert not v["rms_physical"]


def test_acceptance_rejects_on_impossible_tol():
    mesh = _build("smoke")
    v = acceptance(mesh, cycles=1, tol=1e-20)
    assert not v["accepted"]


def test_cli_exit_codes(tmp_path):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    base = [sys.executable, "-m", "mgcfd_tpu.validate.capacity",
            "--preset", "smoke", "--platform", "cpu", "--cycles", "1"]
    r = subprocess.run(base, env=env, capture_output=True, text=True,
                       timeout=540, cwd=REPO)
    assert r.returncode == 0, r.stderr[-1500:]
    doc = json.loads(r.stdout.strip().splitlines()[-1])
    assert doc["accepted"] and doc["criterion"] == "capacity_acceptance"
    r2 = subprocess.run(base + ["--tol", "1e-20"], env=env,
                        capture_output=True, text=True, timeout=540,
                        cwd=REPO)
    assert r2.returncode == 1


@pytest.mark.skipif(not os.environ.get("MGCFD_CAPACITY_ACCEPT"),
                    reason="hours of fp64 CPU; set MGCFD_CAPACITY_ACCEPT=1")
@pytest.mark.parametrize("preset", ["capacity-box", "capacity-tet"])
def test_capacity_acceptance_real(preset):
    """The real capacity criterion (BASELINE.md cites its output):
    equivalent to `python -m mgcfd_tpu.validate.capacity --preset
    {capacity-box,capacity-tet}`."""
    mesh = _build(preset)
    v = acceptance(mesh, cycles=2)
    assert v["accepted"], v


def test_split_leg_flow_matches_single_process(tmp_path):
    """The two-process certification flow (leg-fp32 + leg-fp64 + judge
    over npz handoffs — how the real-TPU numerics are certified,
    VERDICT r04 #2) must reach the same verdict as the single-process
    criterion."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    base = [sys.executable, "-m", "mgcfd_tpu.validate.capacity",
            "--preset", "smoke", "--platform", "cpu", "--cycles", "1"]
    f32, f64 = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    for split, out in (("leg-fp32", f32), ("leg-fp64", f64)):
        r = subprocess.run(base + ["--split", split, "--out", out],
                           env=env, capture_output=True, text=True,
                           timeout=540, cwd=REPO)
        assert r.returncode == 0, r.stderr[-1500:]
    r = subprocess.run(base + ["--split", "judge", "--fp32", f32,
                               "--fp64", f64],
                       env=env, capture_output=True, text=True,
                       timeout=540, cwd=REPO)
    assert r.returncode == 0, r.stderr[-1500:]
    doc = json.loads(r.stdout.strip().splitlines()[-1])
    assert doc["accepted"], doc
    assert doc["fp32_device"] and doc["fp64_device"]
