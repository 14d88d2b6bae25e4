"""Wait for the axon TPU backend to become available, then exec a script."""
import sys, time, subprocess
deadline = time.time() + 600
attempt = 0
while time.time() < deadline:
    attempt += 1
    r = subprocess.run([sys.executable, "-c",
        "import jax; d=jax.devices(); assert d[0].platform!='cpu', d; print(d)"],
        capture_output=True, text=True)
    if r.returncode == 0:
        print(f"TPU up after {attempt} attempts: {r.stdout.strip().splitlines()[-1]}")
        sys.exit(subprocess.run([sys.executable] + sys.argv[1:]).returncode)
    time.sleep(15)
print("TPU never came up", file=sys.stderr)
sys.exit(1)
