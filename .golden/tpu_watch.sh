#!/bin/bash
# wait for the axon TPU to come back, then run the parts profiler + bench
cd /root/repo
export PYTHONPATH=/root/repo
for i in $(seq 1 240); do
  if timeout 90 python -c "import jax; d=jax.devices(); assert d[0].platform!='cpu'" 2>/dev/null; then
    echo "TPU up at attempt $i ($(date))"
    python .golden/profile_parts.py 2>&1 | grep -v -i warning
    echo "=== bench ==="
    python bench.py 2>&1 | grep -v -i warning
    exit 0
  fi
  sleep 30
done
echo "TPU never recovered"
exit 1
