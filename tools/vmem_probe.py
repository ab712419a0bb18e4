"""Fault-surface probe for the explicit-vmem-limit worker fault.

Measured findings on this v5e stack (2026-08-17, via this harness run
config-by-config):

* 74x61x32, direct, NO limit ............................ OK
* 74x61x32, direct, vmem_limit_bytes = 16 MiB (== Mosaic's
  default value!) ....................................... WORKER FAULT
* 74x61x32, shard_map (1,1), 16 MiB ..................... WORKER FAULT
* 512-1500-wide shapes, shard_map, 64 MiB ............... OK (every
  production bench config runs this daily)

Since the tile selection is IDENTICAL with and without the flag and even
the default value faults, the flag itself flips Mosaic's scoped-vmem
codegen into emitting faulting code at narrow-I shapes — a compiler-stack
bug that can only be mapped, not fixed here.  The framework's policy
(``advance_mu_t_pallas``): no explicit limit by default anywhere; the
raised limit only inside the measured-safe wide-lane region
(``VMEM_LIMIT_SAFE_LANES``), with this probe as the re-mapping tool after
any compiler-stack change.  ``WRF_TPU_VMEM_LIMIT=-1`` force-disables
limits everywhere.

Each (shape, limit, call-form) config runs in its OWN subprocess (a fault
kills only that subprocess's client), with a health-gate between configs
(worker restarts take minutes — run a slice ``python tools/vmem_probe.py
LO HI`` when the relay is slow).

Outcome per config: OK / COMPILE-ERROR (graceful) / FAULT (client died or
worker went unhealthy) / TIMEOUT.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = """
import json, sys
cfg = json.loads(sys.argv[1])
import jax, numpy as np
import jax.numpy as jnp
from wrf_tpu.io import fixtures
from wrf_tpu.ops.advance_mu_t_pallas import advance_mu_t_pallas

case = fixtures.make_case(cfg["nx"], cfg["ny"], cfg["nz"], halo=3, seed=1)
kw = case.kernel_kwargs()
b, flags = case.bounds, case.flags
i0, i1, j0, j1, k0, k1 = b.loop_bounds(flags)
arr = {k: v for k, v in kw.items() if hasattr(v, "ndim")}
sc = {k: kw[k] for k in ("rdx", "rdy", "dts", "epssm")}

def step(ins):
    return advance_mu_t_pallas(
        **ins, **sc, window=(i0, i1, j0, j1), k0=k0, k1=k1,
        kde=b.mem(b.kde, "k"), vmem_limit=cfg["limit"] or None,
        tj=cfg.get("tj"))

if cfg["form"] == "direct":
    out = jax.jit(step)(arr)
else:
    from jax.sharding import Mesh, PartitionSpec as P
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("j", "i"))
    out = jax.jit(jax.shard_map(step, mesh=mesh,
                                in_specs=P(), out_specs=P(),
                                check_vma=False))(arr)
print("CHK", float(jnp.sum(out["t"])))
"""


from wrf_tpu.utils.health import (healthy_subprocess as healthy,
                                  wait_healthy_subprocess as wait_healthy)


def run_config(cfg, timeout=300):
    try:
        r = subprocess.run([sys.executable, "-c", CHILD, json.dumps(cfg)],
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return "TIMEOUT", ""
    if r.returncode == 0 and "CHK" in r.stdout:
        return "OK", r.stdout.strip().splitlines()[-1]
    err = (r.stderr or "")[-2000:]
    for marker in ("Mosaic failed", "RESOURCE_EXHAUSTED", "exceeds",
                   "ValueError"):
        if marker in err:
            line = next((l for l in err.splitlines() if marker in l), marker)
            return "COMPILE-ERROR", line[:160]
    return "FAULT", err.splitlines()[-1][:160] if err else "no stderr"


def main():
    mib = 2**20
    matrix = []
    # the round-1 fault cite: K=32, I=128-class tiles, direct call
    for limit in (0, 16 * mib, 32 * mib, 64 * mib, 100 * mib):
        matrix.append(dict(nx=74, ny=61, nz=32, form="direct", limit=limit))
    # same shape through shard_map (the gated-OK form)
    for limit in (0, 64 * mib):
        matrix.append(dict(nx=74, ny=61, nz=32, form="shard", limit=limit))
    # a wide-I shape (the gate currently ALLOWS the raised limit here)
    for limit in (0, 64 * mib):
        matrix.append(dict(nx=512, ny=64, nz=50, form="direct", limit=limit))

    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else len(matrix)
    matrix = matrix[lo:hi]

    results = []
    for cfg in matrix:
        if not wait_healthy():
            print("worker never recovered; aborting matrix", flush=True)
            break
        status, note = run_config(cfg)
        lim = cfg["limit"] // mib if cfg["limit"] else "default"
        print(f"{cfg['nx']}x{cfg['ny']}x{cfg['nz']} {cfg['form']:>6} "
              f"limit={lim:>7}: {status}  {note}", flush=True)
        results.append((cfg, status))
    bad = [r for r in results if r[1] not in ("OK", "COMPILE-ERROR")]
    print(f"\n{len(results)} configs, {len(bad)} fault/timeout")


if __name__ == "__main__":
    main()
