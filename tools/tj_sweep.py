"""Measured tj x vmem-limit sweep for the sharded loops on the real chip.

The any-integer tile search (``_pick_tj``) showed tj is still a live lever
at the 512-wide bench shape (tj 8 -> 12 bought ~7%), so this sweep maps
the next rung: larger tiles under limits above the default 64 MiB, up
toward the v5e's 128 MiB physical VMEM.  Each configuration runs in its
own health-gated subprocess (same fault containment as vmem_probe.py —
an over-budget limit can fault the worker, and restarts take minutes).

Usage: python tools/tj_sweep.py [--loop mu_t|coupled] [--grid NX NY NZ]

Writes one line per config: tj, limit, ms/substep (marginal) or the
failure mode.  The winning (tj, limit) goes into
``advance_mu_t_pallas.sharded_tile_params`` as a measured constant.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MIB = 2**20


from wrf_tpu.utils.health import (healthy_subprocess as healthy,
                                  wait_healthy_subprocess as wait_healthy)


def run_config(loop, nx, ny, nz, tj, limit, timeout=900):
    env = dict(os.environ)
    env["WRF_TPU_VMEM_LIMIT"] = str(limit)
    cmd = [sys.executable, "tools/bench_coupled.py",
           str(nx), str(ny), str(nz), str(tj), "--only", loop]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, env=env,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
    except subprocess.TimeoutExpired:
        return "TIMEOUT", ""
    tail = [l for l in r.stdout.splitlines() if "ms/substep" in l]
    if r.returncode == 0 and tail:
        return "OK", tail[-1].strip()
    err = (r.stderr or "")[-2000:]
    for marker in ("RESOURCE_EXHAUSTED", "Ran out of memory", "exceeded",
                   "Mosaic failed", "ValueError"):
        if marker in err:
            line = next((l for l in err.splitlines() if marker in l), marker)
            return "COMPILE-ERROR", line[:160]
    return "FAULT", err.splitlines()[-1][:160] if err else "no stderr"


def main():
    loop = "mu_t"
    nx = ny = 512
    nz = 50
    args = sys.argv[1:]
    if "--loop" in args:
        loop = args[args.index("--loop") + 1]
    if "--grid" in args:
        i = args.index("--grid")
        nx, ny, nz = int(args[i + 1]), int(args[i + 2]), int(args[i + 3])

    # MEASURED OUTCOME (2026-08-17, v5e): (12, 64M) ran clean at 0.781
    # ms/substep — the production default.  The next rung, (14, 72M),
    # hard-faulted the worker (down for over an hour, far beyond the
    # usual 1-3 min restart), consistent with the narrow-shape
    # vmem-limit fault class (tools/vmem_probe.py): limits above 64 MiB
    # are fault territory on this compiler stack even in the wide-lane
    # measured-safe region.  64 MiB is therefore the measured ceiling;
    # the larger entries below are kept for re-probing after a stack
    # change — run them LAST and expect to lose the worker.
    matrix = [
        (12, 64 * MIB),    # current default pick — same-session baseline
        (14, 72 * MIB),
        (16, 80 * MIB),
        (20, 100 * MIB),
        (24, 116 * MIB),
    ]
    for tj, limit in matrix:
        if not wait_healthy():
            print("worker never recovered; aborting sweep", flush=True)
            break
        status, note = run_config(loop, nx, ny, nz, tj, limit)
        print(f"{loop} {nx}x{ny}x{nz} tj={tj:>2} limit={limit // MIB:>3}M: "
              f"{status}  {note}", flush=True)


if __name__ == "__main__":
    main()
