"""Weak-scaling measurement harness: the one command between new
multi-chip hardware and the BASELINE >=80% efficiency verdict.

Weak scaling holds the LOCAL tile fixed while the mesh (and the global
domain) grows; ideal scaling keeps ms/substep flat, and efficiency is
t(1 device) / t(N devices).  SCALING.md models this ladder analytically
from single-chip measurables (compute/substep + the measured 12.9 us
in-scan exchange overhead); this harness produces the measured table the
moment an N-chip slice exists:

    python tools/weak_scaling.py                  # all visible devices
    python tools/weak_scaling.py --tile 256 --nz 50
    python tools/weak_scaling.py --dryrun         # virtual CPU mesh today

It emits ONE JSON line:

  {"metric": "weak_scaling_efficiency", "tile": [ny, nx, nz],
   "ladder": [{"n_devices": 1, "mesh": [1, 1], "global": [...],
               "ms_per_substep": ..., "efficiency": 1.0}, ...],
   "min_efficiency": ..., "pass_80pct": true/false,
   "model": {...}}          # SCALING.md's prediction alongside

``--dryrun`` (or running on CPU) executes the identical ladder on the
virtual device mesh — tiny tiles, interpreted kernels — validating the
harness end to end; its timings are NOT hardware numbers and the line is
marked ``"dryrun": true``.

Reference parity: the reference validates its 3-GPU decomposition by
reassembly (advance_mu_t_no_async.cu); its README publishes the speedup
table this harness generalizes to an efficiency ladder (README.md:16-24).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def mesh_shape_for(n: int) -> tuple[int, int]:
    """Near-square (j, i) factorization, j >= i (j is the cheaper axis to
    grow: row exchanges stay contiguous)."""
    i = int(np.sqrt(n))
    while n % i:
        i -= 1
    return (n // i, i)


def ladder_sizes(n_devices: int) -> list[int]:
    sizes = [1]
    while sizes[-1] * 2 <= n_devices:
        sizes.append(sizes[-1] * 2)
    if sizes[-1] != n_devices:
        sizes.append(n_devices)
    return sizes


def time_substep(mesh, tile, nz, *, steps_pair=(20, 80), repeats=8,
                 with_w=False, inner_steps=1, tj=None,
                 halo_backend="ppermute") -> float:
    """ms per coupled substep at a FIXED local tile on ``mesh`` (marginal
    two-count method, scalar-readback synced — bench.py's protocol)."""
    from wrf_tpu.io import fixtures
    from wrf_tpu.models.small_step import SmallStepLoop
    from wrf_tpu.parallel.sharded import case_to_domain
    from wrf_tpu.utils.timing import blocked_counts

    nj, ni = mesh.shape["j"], mesh.shape["i"]
    ny, nx = tile[0] * nj, tile[1] * ni
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=42)
    n1, n2 = blocked_counts(inner_steps, *steps_pair, min_passes=2)
    times = {}
    for steps in (n1, n2):
        hb = (halo_backend
              if inner_steps == 1 and mesh.shape["j"] > 1 else "ppermute")
        loop = SmallStepLoop(mesh, nx, ny, nz, case.flags, n_steps=steps,
                             with_w=with_w, inner_steps=inner_steps, tj=tj,
                             halo_backend=hb)
        arrays = loop.prepare(case_to_domain(case, with_w=with_w))
        scal = (case.rdx, case.rdy, case.dts, case.epssm)

        def run():
            out = loop(arrays, *scal)
            return float(jnp.sum(out["t"][:, 0, :]) + jnp.sum(out["mu"]))

        assert np.isfinite(run())
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        times[steps] = best
    return (times[n2] - times[n1]) / (n2 - n1) * 1e3


#: measured chip records the model is built from — refreshed every
#: round from the bench's stability panel (bench.stability_panel, in
#: BENCH_r*.json) precisely because the numbers drift with the worker
#: stack: r03 measured overlap cheapest (31.8 vs 37.1/43.3,
#: commit 25ec382), r04 ppermute cheapest at 5x the cost
#: (25.8/38.8/43.2), and the r05 official run measured everything
#: another 3-5x cheaper (4.7/6.3/9.0 us, base-spread noise 0.2 us).
#: The ORDERING (ppermute <= rdma <= overlap on a self-ring) has held
#: since r04; the overlap backend's grid permutation only pays off
#: when a real wire transfer hides under it, so ppermute stays the
#: default.
MEASURED = {
    # per-substep exchange overhead by backend, us, at the 128x128x50
    # knee — single-chip self-ring (launch/scheduling cost; wire time
    # excluded); r05 stability panel, official bench run 2026-08-21
    "exchange_us": {"ppermute": 4.7, "rdma": 6.3, "rdma_overlap": 9.0},
    # coupled substep compute at 512x512x50, ms (S=1 unblocked / S=4
    # blocked — the blocked loop exchanges once per S substeps, so its
    # per-substep exchange cost divides by S).  S4 is the r05
    # aliased-carry record; S1 is the r04 unblocked measurement (not
    # re-run as an official row since).
    "coupled_ms_512": {"S1": 1.01, "S4_blocked": 0.4446},
    "provenance": "BENCH_r05 stability panel 2026-08-21 (self-ring "
                  "128^2 knee, noise 0.2 us) + r05 512^2 coupled "
                  "records; exchange costs are stack-dependent — "
                  "see the per-round panel rows in BENCH_r*.json",
}


def model_prediction(tile, nz, halo_backend="ppermute",
                     inner_steps=1) -> dict:
    """Analytic weak-scaling efficiency at this tile from single-chip
    measurables: the MEASURED per-substep exchange overhead of the
    selected backend vs compute scaled from the measured 512x512x50
    coupled substep.  Cites its provenance so the emitted record is
    checkable against SCALING.md's (reconciled) table."""
    ex = MEASURED["exchange_us"].get(halo_backend,
                                     MEASURED["exchange_us"]["ppermute"])
    if inner_steps > 1:
        # blocked loops run ONE width-S exchange per S substeps
        ex = ex / inner_steps
        compute_ms = MEASURED["coupled_ms_512"]["S4_blocked"]
    else:
        compute_ms = MEASURED["coupled_ms_512"]["S1"]
    compute_us = compute_ms * 1e3 * (tile[0] * tile[1] * nz) / (512 * 512 * 50)
    eff = compute_us / (compute_us + ex)
    return {"halo_backend": halo_backend,
            "exchange_us": round(ex, 1),
            "compute_us": round(compute_us, 1),
            "predicted_efficiency": round(eff, 3),
            "provenance": MEASURED["provenance"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=256,
                    help="local tile edge (ny_loc = nx_loc)")
    ap.add_argument("--nz", type=int, default=50)
    ap.add_argument("--with-w", action="store_true")
    ap.add_argument("--inner-steps", type=int, default=1)
    ap.add_argument("--halo-backend", default="ppermute",
                    choices=["ppermute", "rdma", "rdma_overlap"],
                    help="per-substep exchange backend for the measured "
                         "ladder (SmallStepLoop); the model block "
                         "predicts from the same backend's measured "
                         "exchange cost")
    ap.add_argument("--max-devices", type=int, default=0)
    ap.add_argument("--dryrun", action="store_true",
                    help="tiny tiles on the virtual CPU mesh (validates "
                         "the harness; timings are not hardware numbers)")
    args = ap.parse_args()

    if args.dryrun:
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
        jax.config.update("jax_platforms", "cpu")

    from wrf_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    dryrun = devices[0].platform == "cpu"
    if args.max_devices:
        devices = devices[: args.max_devices]
    tile = (12, 12) if dryrun else (args.tile, args.tile)
    nz = 8 if dryrun else args.nz
    pair = (3, 7) if dryrun else (20, 80)
    repeats = 1 if dryrun else 8

    ladder = []
    base_ms = None
    for n in ladder_sizes(len(devices)):
        shape = mesh_shape_for(n)
        mesh = make_mesh(devices[:n], shape)
        ms = time_substep(mesh, tile, nz, steps_pair=pair, repeats=repeats,
                          with_w=args.with_w, inner_steps=args.inner_steps,
                          halo_backend=args.halo_backend)
        if base_ms is None:
            base_ms = ms
        ladder.append({
            "n_devices": n, "mesh": list(shape),
            "global": [tile[0] * shape[0], tile[1] * shape[1], nz],
            "ms_per_substep": round(ms, 4),
            # interpret-mode dryrun marginals can be sub-noise (<=0) —
            # efficiency only means something when both ends are positive
            "efficiency": (round(base_ms / ms, 3)
                           if ms > 0 and base_ms > 0 else None),
        })

    effs = [r["efficiency"] for r in ladder if r["efficiency"]]
    rec = {
        "metric": "weak_scaling_efficiency",
        "tile": [tile[0], tile[1], nz],
        "ladder": ladder,
        "min_efficiency": min(effs) if effs else None,
        "pass_80pct": bool(effs and min(effs) >= 0.8),
        "model": model_prediction(tile, nz, args.halo_backend,
                                  args.inner_steps),
        **({"dryrun": True} if dryrun else {}),
    }
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
