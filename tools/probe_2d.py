"""Probe: 2-D (j, i)-tiled Pallas grid with lane-offset Element windows.

The production kernels tile only j (grid=(gj,)); each program holds full
lane rows, so VMEM-per-program scales with the domain width and CONUS is
pinned at tj=4 (VERDICT r03 #1).  The 2-D design adds lane tiling: input
windows of ``ti + 2*halo`` lanes at offset ``gi*ti`` (128-aligned when
ti is), output windows of ``ti`` lanes at offset ``halo + gi*ti``
(UNALIGNED by the halo width).  Whether Mosaic accepts/compiles these
lane-offset Element windows efficiently is an empirical question — this
probe answers it with a representative mini-stencil (i±1 lane rolls +
a sequential k scan), checked bit-exact against the full-row 1-D grid
form, then timed.

Run CPU (interpret): JAX_PLATFORMS=cpu python tools/probe_2d.py
Run chip:            python tools/probe_2d.py [--shape J K I] [--time]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = jnp.float32
HALO = 128  # lane ring/halo width: Mosaic requires lane block sizes
            # AND window offsets divisible by 128 (probe findings,
            # 2026-08-20), so the ring is one full 128-lane block and
            # center windows land aligned for free


def _body(x, K):
    """Representative per-tile compute: lane stencil + k cumsum."""
    st = x + pltpu.roll(x, 1, 2) + pltpu.roll(x, K and 1, 2) * 0.5
    st = st + pltpu.roll(x, (-1) % x.shape[2], 2)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (1, K, 1), 1)
    y = st
    d = 1
    while d < K:
        y = y + jnp.where(kiota >= d, pltpu.roll(y, d % K, 1), F(0.0))
        d *= 2
    return y


def kernel_1d(x_ref, o_ref, *, K):
    o_ref[:] = _body(x_ref[:], K)[:, :, :]


def kernel_2d(x_ref, o_ref, *, K, ti):
    y = _body(x_ref[:], K)           # (tj, K, ti + 2*HALO)
    o_ref[:] = y[:, :, HALO : HALO + ti]


def run_1d(x, tj, interpret):
    J, K, I = x.shape
    spec = pl.BlockSpec((pl.Element(tj), pl.Element(K), pl.Element(I)),
                        lambda g: (1 + g * tj, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(kernel_1d, K=K),
        grid=((J - 2) // tj,),
        in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((J, K, I), F),
        interpret=interpret,
    )(x)
    return out


def run_2d(x, tj, ti, interpret):
    """x lanes: [HALO | interior (multiple of ti) | HALO | pad]."""
    J, K, I = x.shape
    ni = I - 2 * HALO
    gi = ni // ti
    in_spec = pl.BlockSpec(
        (pl.Element(tj), pl.Element(K), pl.Element(ti + 2 * HALO)),
        lambda gj, gi_: (1 + gj * tj, 0, gi_ * ti),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (pl.Element(tj), pl.Element(K), pl.Element(ti)),
        lambda gj, gi_: (1 + gj * tj, 0, HALO + gi_ * ti),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(kernel_2d, K=K, ti=ti),
        grid=((J - 2) // tj, gi),
        in_specs=[in_spec], out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((J, K, I), F),
        interpret=interpret,
    )(x)
    return out


def main():
    # the TPU tunnel's sitecustomize imports jax at startup and captures
    # JAX_PLATFORMS — re-apply the env choice through the config API
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=3, default=[130, 50, 1664],
                    help="J K I (I = 2*HALO + interior; interior % ti == 0)")
    ap.add_argument("--tj", type=int, default=4)
    ap.add_argument("--ti", type=int, default=512)
    ap.add_argument("--time", action="store_true")
    args = ap.parse_args()
    J, K, I = args.shape
    interpret = jax.devices()[0].platform == "cpu"
    print(f"platform={jax.devices()[0].platform} interpret={interpret}")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((J, K, I)), F)

    a = np.asarray(run_1d(x, args.tj, interpret))
    b = np.asarray(run_2d(x, args.tj, args.ti, interpret))
    ni = I - 2 * HALO
    ca = a[1 : J - 1, :, HALO : HALO + ni]
    cb = b[1 : J - 1, :, HALO : HALO + ni]
    # the 1-D form's rolls WRAP at the array edge; the 2-D form's wrap at
    # each tile edge is fed by the halo lanes, so only lanes >= 1 from
    # the (identically-haloed) edges are comparable — like production,
    # where the ring rows/lanes feed the stencil
    ok = np.array_equal(ca[:, :, 1:-1], cb[:, :, 1:-1])
    print(f"2-D vs 1-D bit-equal (interior lanes): {ok}")
    if not ok:
        d = np.abs(ca[:, :, 1:-1] - cb[:, :, 1:-1])
        print("maxabs", d.max(), "ndiff", (d > 0).sum(), "of", d.size)
        raise SystemExit(1)

    if args.time and not interpret:
        for name, fn, kw in (("1d", run_1d, {"tj": args.tj}),
                             ("2d", run_2d, {"tj": args.tj, "ti": args.ti})):
            @jax.jit
            def loop(x, fn=fn, kw=kw):
                def body(c, _):
                    return fn(c, interpret=False, **kw), None
                c, _ = jax.lax.scan(body, x, length=50)
                return jnp.sum(c[:, 0, :])
            float(loop(x))
            best = min(
                (lambda t0: (float(loop(x)), time.perf_counter() - t0)[1])(
                    time.perf_counter())
                for _ in range(8))
            gbs = 2 * J * K * I * 4 * 50 / best / 1e9
            print(f"{name}: {best / 50 * 1e3:.4f} ms/call  {gbs:.0f} GB/s")


if __name__ == "__main__":
    main()
