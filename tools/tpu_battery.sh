#!/bin/bash
# Health-gated TPU measurement battery. Run serially; one TPU job at a time.
cd "$(dirname "$0")/.."

health() {
  for i in $(seq 1 15); do
    r=$(timeout 60 python -c "
import jax, jax.numpy as jnp
print(float(jnp.ones((8,128)).sum()))" 2>/dev/null | tail -1)
    if [ "$r" = "1024.0" ]; then echo "health OK"; return 0; fi
    sleep 20
  done
  echo "health FAILED"; return 1
}

health || exit 1
echo "=== bench.py ==="
# the 9-row matrix takes ~50 min (two CONUS compile pairs); the budget
# env makes bench stop STARTING rows near the wall and SIGTERM makes it
# emit whatever records it has
WRF_TPU_BENCH_BUDGET_S=3100 timeout --preserve-status 3500 \
  python bench.py 2>&1 | tail -1

health || exit 1
echo "=== coupled 512 ==="
timeout 580 python tools/bench_coupled.py 512 512 50 2>&1 | grep -E "^(coupled|mu_t)"

health || exit 1
echo "=== coupled CONUS 1500 ==="
timeout 580 python tools/bench_coupled.py 1500 1500 50 2>&1 | grep -E "^(coupled|mu_t)"
