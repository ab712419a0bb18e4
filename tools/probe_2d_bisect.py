"""Bisect which lane-tiling feature crashes the Mosaic compile helper.

The production 2-D (j, i)-tiled trapezoid (coupled_multistep_pallas
``ti``) hard-crashes tpu_compile_helper (exit 1, no diagnostics) even at
tiny, VMEM-safe shapes, while the interpret tier is value-correct.  This
probe builds a ladder of minimal kernels from known-good to the failing
form; the first crashing rung is the offending feature.

  a  1-D grid, full-lane Element blocks              (production-known-good)
  b  2-D grid (gj, gi), full-lane blocks, gi=1       (2-D grid alone)
  c  2-D grid, exact-ti aligned lane windows in/out  (lane windows)
  d  c + wide inputs (ti+256 at gi*ti) + in-kernel
     static lane slice for the output                (the design)
  e  d + a second SMEM operand and an output narrower
     than an input (mixed widths across operands)

Run one rung per process (a crash kills the worker for a while):
    python tools/probe_2d_bisect.py <rung> [--shape J K I] [--ti N]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = jnp.float32
RING = 128


def _compute(x, K):
    y = x + pltpu.roll(x, 1, 2) * 0.5
    return y + pltpu.roll(y, 1 % K, 1) * 0.25


def rung_a(x, tj, ti):
    J, K, I = x.shape

    def kern(x_ref, o_ref):
        o_ref[:] = _compute(x_ref[:], K)

    spec = pl.BlockSpec((pl.Element(tj), pl.Element(K), pl.Element(I)),
                        lambda g: (1 + g * tj, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(kern, grid=((J - 2) // tj,), in_specs=[spec],
                          out_specs=spec,
                          out_shape=jax.ShapeDtypeStruct(x.shape, F))(x)


def rung_b(x, tj, ti):
    J, K, I = x.shape

    def kern(x_ref, o_ref):
        o_ref[:] = _compute(x_ref[:], K)

    spec = pl.BlockSpec((pl.Element(tj), pl.Element(K), pl.Element(I)),
                        lambda gj, gi: (1 + gj * tj, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(kern, grid=((J - 2) // tj, 1), in_specs=[spec],
                          out_specs=spec,
                          out_shape=jax.ShapeDtypeStruct(x.shape, F))(x)


def rung_c(x, tj, ti):
    J, K, I = x.shape
    gi_n = (I - 2 * RING) // ti

    def kern(x_ref, o_ref):
        o_ref[:] = _compute(x_ref[:], K)

    spec = pl.BlockSpec((pl.Element(tj), pl.Element(K), pl.Element(ti)),
                        lambda gj, gi: (1 + gj * tj, 0,
                                        pl.multiple_of(RING + gi * ti,
                                                       128)),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(kern, grid=((J - 2) // tj, gi_n),
                          in_specs=[spec], out_specs=spec,
                          out_shape=jax.ShapeDtypeStruct(x.shape, F))(x)


def rung_d(x, tj, ti):
    J, K, I = x.shape
    gi_n = (I - 2 * RING) // ti

    def kern(x_ref, o_ref):
        y = _compute(x_ref[:], K)
        o_ref[:] = y[:, :, RING : RING + ti]

    in_spec = pl.BlockSpec(
        (pl.Element(tj), pl.Element(K), pl.Element(ti + 2 * RING)),
        lambda gj, gi: (1 + gj * tj, 0, pl.multiple_of(gi * ti, 128)),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (pl.Element(tj), pl.Element(K), pl.Element(ti)),
        lambda gj, gi: (1 + gj * tj, 0,
                        pl.multiple_of(RING + gi * ti, 128)),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(kern, grid=((J - 2) // tj, gi_n),
                          in_specs=[in_spec], out_specs=out_spec,
                          out_shape=jax.ShapeDtypeStruct(x.shape, F))(x)


def rung_e(x, tj, ti):
    J, K, I = x.shape
    gi_n = (I - 2 * RING) // ti

    def kern(s_ref, x_ref, c_ref, o_ref, t_ref):
        y = _compute(x_ref[:], K) * s_ref[0, 0]
        o_ref[:] = y[:, :, RING : RING + ti] + c_ref[:]
        t_ref[:] = c_ref[:] * F(2.0)

    in_spec = pl.BlockSpec(
        (pl.Element(tj), pl.Element(K), pl.Element(ti + 2 * RING)),
        lambda gj, gi: (1 + gj * tj, 0, gi * ti),
        memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec(
        (pl.Element(tj), pl.Element(K), pl.Element(ti)),
        lambda gj, gi: (1 + gj * tj, 0, RING + gi * ti),
        memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda gj, gi: (0, 0),
                        memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        kern, grid=((J - 2) // tj, gi_n),
        in_specs=[smem, in_spec, c_spec],
        out_specs=[c_spec, c_spec],
        out_shape=[jax.ShapeDtypeStruct(x.shape, F)] * 2,
    )(jnp.ones((1, 1), F), x, x)
    return outs[0]


def _mo(expr):
    return pl.multiple_of(expr, 128)


def rung_f(x, tj, ti):
    """d + a thin (tj, 1, lanes) windowed 2-D operand + a (1, K) VMEM
    vector with a 2-arg flat index map (production operand mix)."""
    J, K, I = x.shape
    gi_n = (I - 2 * RING) // ti
    thin = jnp.ones((J, 1, I), F)
    vec = jnp.ones((1, K), F)

    def kern(x_ref, m_ref, v_ref, o_ref):
        y = _compute(x_ref[:], K)
        y = y * m_ref[:] + v_ref[:].reshape(1, K, 1)
        o_ref[:] = y[:, :, RING : RING + ti]

    in_spec = pl.BlockSpec(
        (pl.Element(tj), pl.Element(K), pl.Element(ti + 2 * RING)),
        lambda gj, gi: (1 + gj * tj, 0, _mo(gi * ti)),
        memory_space=pltpu.VMEM)
    thin_spec = pl.BlockSpec(
        (pl.Element(tj), pl.Element(1), pl.Element(ti + 2 * RING)),
        lambda gj, gi: (1 + gj * tj, 0, _mo(gi * ti)),
        memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, K), lambda gj, gi: (0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (pl.Element(tj), pl.Element(K), pl.Element(ti)),
        lambda gj, gi: (1 + gj * tj, 0, _mo(RING + gi * ti)),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(kern, grid=((J - 2) // tj, gi_n),
                          in_specs=[in_spec, thin_spec, vec_spec],
                          out_specs=out_spec,
                          out_shape=jax.ShapeDtypeStruct(x.shape, F))(
        x, thin, vec)


def rung_h(x, tj, ti):
    """f + (tj, K, ti) VMEM scratch + sequential pl.ds fori_loop scan
    (the ww-scan shape)."""
    J, K, I = x.shape
    gi_n = (I - 2 * RING) // ti

    def kern(x_ref, o_ref, scan_ref):
        y = _compute(x_ref[:], K)
        scan_ref[:] = y[:, :, RING : RING + ti]

        def body(k, _):
            scan_ref[:, pl.ds(k, 1), :] = (
                scan_ref[:, pl.ds(k - 1, 1), :]
                + scan_ref[:, pl.ds(k, 1), :])
            return 0

        jax.lax.fori_loop(1, K, body, 0)
        o_ref[:] = scan_ref[:]

    in_spec = pl.BlockSpec(
        (pl.Element(tj), pl.Element(K), pl.Element(ti + 2 * RING)),
        lambda gj, gi: (1 + gj * tj, 0, _mo(gi * ti)),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (pl.Element(tj), pl.Element(K), pl.Element(ti)),
        lambda gj, gi: (1 + gj * tj, 0, _mo(RING + gi * ti)),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(kern, grid=((J - 2) // tj, gi_n),
                          in_specs=[in_spec], out_specs=out_spec,
                          out_shape=jax.ShapeDtypeStruct(x.shape, F),
                          scratch_shapes=[pltpu.VMEM((tj, K, ti), F)])(x)


def rung_i(x, tj, ti):
    """d + input/output ALIASING on a center-windowed operand (the
    production t/seed aliasing under lane windows)."""
    J, K, I = x.shape
    gi_n = (I - 2 * RING) // ti

    def kern(x_ref, t_ref, o_ref, t_out):
        y = _compute(x_ref[:], K)
        o_ref[:] = y[:, :, RING : RING + ti]
        t_out[:] = t_ref[:] + F(1.0)

    in_spec = pl.BlockSpec(
        (pl.Element(tj), pl.Element(K), pl.Element(ti + 2 * RING)),
        lambda gj, gi: (1 + gj * tj, 0, _mo(gi * ti)),
        memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec(
        (pl.Element(tj), pl.Element(K), pl.Element(ti)),
        lambda gj, gi: (1 + gj * tj, 0, _mo(RING + gi * ti)),
        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern, grid=((J - 2) // tj, gi_n),
        in_specs=[in_spec, c_spec], out_specs=[c_spec, c_spec],
        out_shape=[jax.ShapeDtypeStruct(x.shape, F)] * 2,
        input_output_aliases={1: 1},
    )(x, x)
    return outs[0]


def rung_j(x, tj, ti):
    """h but with the sequential scan UNROLLED over STATIC slice
    indices (no pl.ds, no fori_loop) — same op sequence, same
    association."""
    J, K, I = x.shape
    gi_n = (I - 2 * RING) // ti

    def kern(x_ref, o_ref, scan_ref):
        y = _compute(x_ref[:], K)
        scan_ref[:] = y[:, :, RING : RING + ti]
        for k in range(1, K):
            scan_ref[:, k : k + 1, :] = (
                scan_ref[:, k - 1 : k, :] + scan_ref[:, k : k + 1, :])
        o_ref[:] = scan_ref[:]

    in_spec = pl.BlockSpec(
        (pl.Element(tj), pl.Element(K), pl.Element(ti + 2 * RING)),
        lambda gj, gi: (1 + gj * tj, 0, _mo(gi * ti)),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (pl.Element(tj), pl.Element(K), pl.Element(ti)),
        lambda gj, gi: (1 + gj * tj, 0, _mo(RING + gi * ti)),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(kern, grid=((J - 2) // tj, gi_n),
                          in_specs=[in_spec], out_specs=out_spec,
                          out_shape=jax.ShapeDtypeStruct(x.shape, F),
                          scratch_shapes=[pltpu.VMEM((tj, K, ti), F)])(x)


def main():
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    ap = argparse.ArgumentParser()
    ap.add_argument("rung", choices=list("abcdefhij"))
    ap.add_argument("--shape", type=int, nargs=3, default=[26, 16, 512])
    ap.add_argument("--ti", type=int, default=128)
    ap.add_argument("--tj", type=int, default=4)
    args = ap.parse_args()
    J, K, I = args.shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((J, K, I)), F)
    fn = {"a": rung_a, "b": rung_b, "c": rung_c, "d": rung_d,
          "e": rung_e, "f": rung_f, "h": rung_h,
          "i": rung_i, "j": rung_j}[args.rung]
    y = fn(x, args.tj, args.ti)
    ok = bool(np.isfinite(np.asarray(y)).all())
    print(f"rung {args.rung}: compiled+ran, finite={ok}", flush=True)


if __name__ == "__main__":
    main()
