"""CLI verification driver: load a golden fixture, run a tier, diff, time.

Framework analog of the reference's three driver executables
(advance_mu_t_driver.{f90,c,cu}): read every input field from the fixture
directory, run ``advance_mu_t`` for N small steps on the selected tier,
print the timing line, then the per-field comparison report (equal/diff
counts, max rel/abs error, max ULP, RMSE — the reference's metric suite).

Usage:
    python -m wrf_tpu.driver FIXTURE_DIR [--steps N] [--tier T] [--mesh JxI]
                             [--dump-intermediates DIR]

Tiers: numpy (golden path), native (C++ oracle), xla, pallas
(single-tile device paths), sharded-xla / sharded-pallas (mesh-decomposed,
honours --mesh), coupled / coupled-xla (the full acoustic small-step loop —
uv + mu/t, plus the vertically-implicit w substep under --with-w — verified
against the in-process golden loop; honours --mesh).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from .compare import compare
from .io import codec, fixtures

#: output-field -> golden file name (reference driver naming,
#: advance_mu_t_driver.c:247-257)
GOLDEN_FILES = {
    "ww": "grid_ww_output.bin",
    "t": "grid_t_2_output.bin",
    "t_ave": "t_2save_output.bin",
    "mu": "grid_mu_2_output.bin",
    "muave": "muave_output.bin",
    "muts": "grid_muts_output.bin",
    "mudf": "grid_mudf_output.bin",
}

#: the driver's acceptance gate — ELEMENT-WISE ``|a-g| <= atol + rtol*|g|``
#: with the absolute floor scaled per field (``atol_scale * max|golden|``),
#: the same formula the test suite asserts (compare.assert_outputs_allclose)
RTOL = 1e-4
ATOL_SCALE = 1e-5

#: acceptance for --precision bf16-const: the documented contract of the
#: reduced-precision constant-stream mode (tests/test_bf16.py) — outputs
#: within 2e-2 of field scale of the f32 loop over O(10) substeps
BF16_RTOL = 2e-2
BF16_ATOL_SCALE = 2e-2


def run_tier(case, steps: int, tier: str, mesh_shape=None,
             capture: bool = False, with_w: bool = False,
             const_dtype=None, inner_steps: int = 1,
             fast: bool = False, halo_backend: str = "ppermute"):
    """Run `steps` small steps on the chosen tier; returns
    ``(outputs, seconds, golden_override)`` — ``golden_override`` is None
    for tiers verified against the fixture goldens, or the in-process
    golden outputs for the coupled-loop tiers.

    The timed window covers the step calls only, transfers excluded,
    matching the reference's timing policy."""
    kw = case.kernel_kwargs()

    if tier == "coupled-native":
        # the full coupled loop on the native C++ tier (advance_uv +
        # advance_mu_t + optional advance_w per substep), verified against
        # the numpy golden loop (bit-identical by construction)
        from .models.small_step import small_step_golden
        from .native import (advance_mu_t_native, advance_uv_native,
                             advance_w_native)
        from .ops.advance_uv import DEFAULT_CS2
        from .ops.advance_w import DEFAULT_CW, DEFAULT_GW
        state = {k: kw[k] for k in ("ww", "mu", "t", "t_ave", "u", "v")}
        if with_w:
            wst = {"w": case.fields["grid_w"], "pp": case.fields["grid_pp"]}
        out = dict(state)
        t0 = time.perf_counter()
        for _ in range(steps):
            u, v = advance_uv_native(
                u=state["u"], v=state["v"], mu=state["mu"],
                muu=kw["muu"], muv=kw["muv"], msfuy=kw["msfuy"],
                msfvx_inv=kw["msfvx_inv"], rdx=kw["rdx"], rdy=kw["rdy"],
                dts=kw["dts"], cs2=DEFAULT_CS2,
                flags=case.flags, bounds=case.bounds)
            out = advance_mu_t_native(**{**kw, **state, "u": u, "v": v})
            if with_w:
                wst["w"], wst["pp"] = advance_w_native(
                    w=wst["w"], pp=wst["pp"], t=out["t"],
                    rdn=case.fields["grid_rdn"], rdnw=kw["rdnw"],
                    dts=kw["dts"], epssm=kw["epssm"],
                    cw=DEFAULT_CW, gw=DEFAULT_GW,
                    flags=case.flags, bounds=case.bounds)
            state = {**{k: out[k] for k in ("ww", "mu", "t", "t_ave")},
                     "u": u, "v": v}
        dt = time.perf_counter() - t0
        out = {**out, "u": state["u"], "v": state["v"]}
        if with_w:
            out.update(wst)
        gold = small_step_golden(case, steps, with_w=with_w)
        return out, dt, gold

    if tier.startswith("coupled"):
        import jax
        from .models.small_step import SmallStepLoop, small_step_golden
        from .parallel.mesh import make_mesh
        from .parallel.sharded import case_to_domain, embed_domain
        kernel = "xla" if tier.endswith("xla") else "pallas"
        mesh = make_mesh(
            jax.devices()[: mesh_shape[0] * mesh_shape[1]] if mesh_shape else None,
            mesh_shape,
        )
        nx, ny, nz = case.bounds.ide, case.bounds.jde, case.bounds.kdim
        from .parallel.sharded import embed_outputs
        loop = SmallStepLoop(mesh, nx, ny, nz, case.flags, n_steps=steps,
                             kernel=kernel, with_w=with_w,
                             const_dtype=const_dtype,
                             halo_backend=halo_backend,
                             inner_steps=inner_steps, fast=fast)
        arrays = loop.prepare(case_to_domain(case, with_w=with_w))
        warm = loop(arrays, case.rdx, case.rdy, case.dts, case.epssm)
        np.asarray(warm["t"])  # sync: the warmup run must finish before t0
        t0 = time.perf_counter()
        out_dom = loop(arrays, case.rdx, case.rdy, case.dts, case.epssm)
        out_dom = {k: np.asarray(v) for k, v in out_dom.items()}
        dt = time.perf_counter() - t0
        gold = small_step_golden(case, steps, with_w=with_w)
        return embed_outputs(case, out_dom), dt, gold

    if tier in ("numpy", "native"):
        if tier == "numpy":
            from .ops.reference_numpy import advance_mu_t_numpy as fn
        else:
            from .native import advance_mu_t_native as fn
        state = {k: kw[k] for k in ("ww", "mu", "t", "t_ave")}
        out = dict(state)
        t0 = time.perf_counter()
        for s in range(steps):
            cap = capture and s == steps - 1  # final substep's phase A
            out = fn(**{**kw, **state}, capture_intermediates=cap)
            state = {k: out[k] for k in ("ww", "mu", "t", "t_ave")}
        return out, time.perf_counter() - t0, None

    if tier in ("xla", "pallas"):
        b, flags = case.bounds, case.flags
        i0, i1, j0, j1, k0, k1 = b.loop_bounds(flags)
        arr = {k: v for k, v in kw.items() if hasattr(v, "ndim")}
        sc = {k: kw[k] for k in ("rdx", "rdy", "dts", "epssm")}
        if tier == "pallas":
            import jax
            from .ops.advance_mu_t_pallas import advance_mu_t_pallas
            interp = jax.devices()[0].platform == "cpu"

            def step(ins):
                return advance_mu_t_pallas(
                    **ins, **sc, window=(i0, i1, j0, j1),
                    k0=k0, k1=k1, kde=b.mem(b.kde, "k"),
                    capture=capture, interpret=interp,
                )
        else:
            from .ops.advance_mu_t_jnp import advance_mu_t_core, window_masks
            import jax.numpy as jnp
            i_mask, j_mask = window_masks(b, flags)

            def step(ins):
                return advance_mu_t_core(
                    **ins, **sc,
                    i_mask=jnp.asarray(i_mask), j_mask=jnp.asarray(j_mask),
                    k0=k0, k1=k1, kde=b.mem(b.kde, "k"),
                    capture_intermediates=capture,
                )

        import jax
        step = jax.jit(step)  # one compile; eager dispatch through the
        #                       relay would round-trip per primitive
        state = {k: arr[k] for k in ("ww", "mu", "t", "t_ave")}
        out = step({**arr, **state})  # compile
        t0 = time.perf_counter()
        for _ in range(steps):
            out = step({**arr, **state})
            state = {k: out[k] for k in ("ww", "mu", "t", "t_ave")}
        out = {k: np.asarray(v) for k, v in out.items()}  # readback syncs
        return out, time.perf_counter() - t0, None

    if tier.startswith("sharded"):
        import jax
        from .parallel.mesh import make_mesh
        from .parallel.sharded import (
            ShardedAdvanceMuT, case_to_domain, embed_domain,
        )
        kernel = "pallas" if tier.endswith("pallas") else "xla"
        mesh = make_mesh(
            jax.devices()[: mesh_shape[0] * mesh_shape[1]] if mesh_shape else None,
            mesh_shape,
        )
        nx, ny, nz = case.bounds.ide, case.bounds.jde, case.bounds.kdim
        step = ShardedAdvanceMuT(mesh, nx, ny, nz, case.flags,
                                 n_steps=steps, kernel=kernel,
                                 const_dtype=const_dtype,
                                 inner_steps=inner_steps, fast=fast)
        from .parallel.sharded import embed_outputs
        arrays = step.prepare(case_to_domain(case))
        warm = step(arrays, case.rdx, case.rdy, case.dts, case.epssm)  # compile
        np.asarray(warm["t"])  # sync: the warmup run must finish before t0
        t0 = time.perf_counter()
        out_dom = step(arrays, case.rdx, case.rdy, case.dts, case.epssm)
        out_dom = {k: np.asarray(v) for k, v in out_dom.items()}
        dt = time.perf_counter() - t0
        return embed_outputs(case, out_dom), dt, None

    raise SystemExit(f"unknown tier {tier!r}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("fixture_dir")
    p.add_argument("--steps", type=int, default=None,
                   help="small steps (default: the fixture's steps.bin)")
    p.add_argument("--tier", default="pallas",
                   choices=["numpy", "native", "xla", "pallas",
                            "sharded-xla", "sharded-pallas",
                            "coupled", "coupled-xla", "coupled-native",
                            "all"])
    p.add_argument("--with-w", action="store_true",
                   help="coupled tiers: include the vertically-implicit "
                        "w/pp substep")
    p.add_argument("--mesh", default=None, help="JxI mesh shape for sharded tiers")
    p.add_argument("--dump-intermediates", default=None, metavar="DIR",
                   help="write *_before_theta.bin phase-A captures of the "
                        "final substep (numpy, native, xla and pallas tiers)")
    p.add_argument("--inner-steps", type=int, default=1,
                   help="temporal blocking: substeps fused per Pallas "
                        "pass (sharded-pallas: any S; coupled: 2)")
    p.add_argument("--fast", action="store_true",
                   help="blocked tiers: re-associated f32 fast mode "
                        "(XLA-tier tolerance class)")
    p.add_argument("--precision", default="f32",
                   choices=["f32", "bf16-const"],
                   help="bf16-const (sharded-pallas / coupled tiers): "
                        "narrow the read-only 3-D bases to bf16 in HBM; "
                        "acceptance relaxes to the mode's documented "
                        "2e-2-of-scale contract")
    p.add_argument("--halo-backend", default="ppermute",
                   choices=["ppermute", "rdma", "rdma_overlap"],
                   help="coupled-tier per-substep halo exchange backend "
                        "(SmallStepLoop docstring); rdma_overlap fuses "
                        "the exchange into the substep kernel")
    args = p.parse_args(argv)
    if args.halo_backend != "ppermute" and not (
            args.tier.startswith("coupled") or args.tier == "all"):
        p.error("--halo-backend applies to the coupled tiers")
    if (args.dump_intermediates
            and args.tier not in ("numpy", "native", "xla", "pallas")):
        p.error("--dump-intermediates requires a capture-capable tier "
                "(numpy, native, xla, pallas)")
    if args.precision == "bf16-const":
        if args.tier not in ("sharded-pallas", "coupled"):
            p.error("--precision bf16-const applies to the pallas-kernel "
                    "loop tiers (sharded-pallas, coupled)")
        global RTOL, ATOL_SCALE
        RTOL, ATOL_SCALE = BF16_RTOL, BF16_ATOL_SCALE

    case, fx_steps = fixtures.read_case(args.fixture_dir)
    steps = args.steps if args.steps is not None else fx_steps
    mesh_shape = tuple(int(x) for x in args.mesh.split("x")) if args.mesh else None

    if args.tier == "all":
        # the reference's workflow of running every tier's driver side by
        # side, as one command: per tier, worst per-field result vs the
        # fixture goldens (single-substep tiers) or the in-process golden
        # loop (coupled tiers); "+w" rows add the vertically-implicit w/pp
        # substep
        golden = fixtures.read_golden(args.fixture_dir, case.bounds)
        tiers = ("numpy", "native", "xla", "pallas",
                 "sharded-xla", "sharded-pallas",
                 "coupled", "coupled-xla", "coupled-native",
                 "coupled+w", "coupled-xla+w", "coupled-native+w",
                 "sharded-pallas~bf16", "coupled~bf16",
                 "sharded-pallas~blk", "coupled~blk",
                 "sharded-pallas~blkfast", "coupled~blkfast")
        failures = 0
        for tier in tiers:
            tier_fast = tier.endswith("~blkfast")
            tname = tier[:-8] if tier_fast else tier
            tier_blk = tier_fast or tname.endswith("~blk")
            tname = tname[:-4] if tname.endswith("~blk") else tname
            tier_bf = tname.endswith("~bf16")
            tname = tname[:-5] if tier_bf else tname
            tier_w = tname.endswith("+w")
            tname = tname[:-2] if tier_w else tname
            cd = None
            if tier_bf:
                import jax.numpy as jnp
                cd = jnp.bfloat16
            inner = 1
            if tier_blk:
                inner = 2 if tname == "coupled" else 4
            try:
                out, dt, gold_ov = run_tier(case, steps, tname, mesh_shape,
                                            with_w=tier_w, const_dtype=cd,
                                            inner_steps=inner,
                                            fast=tier_fast)
            except Exception as e:  # report, keep the matrix going
                failures += 1
                print(f"{tier:>20}: ERROR {type(e).__name__}: {e}")
                continue
            gold = gold_ov if gold_ov is not None else golden
            names = sorted(gold.keys() & out.keys()) if gold_ov is not None \
                else list(GOLDEN_FILES)
            rt, ats = ((BF16_RTOL, BF16_ATOL_SCALE) if tier_bf
                       else (RTOL, ATOL_SCALE))
            results = [compare(out[n], gold[n], n, rtol=rt,
                               atol_scale=ats) for n in names]
            worst = max(results, key=lambda r: r.max_scaled_err)
            ok = all(r.passed for r in results)
            failures += 0 if ok else 1
            print(f"{tier:>20}: {dt / steps * 1e3:9.3f} ms/step   "
                  f"worst field {worst.name}: max_abs={worst.max_abs_err:.3e}"
                  f" scaled_err={worst.max_scaled_err:.3f}   "
                  f"{'PASS' if ok else 'FAIL'}")
        if failures:
            print(f"FAILED: {failures} tier(s)")
        return 1 if failures else 0

    const_dtype = None
    if args.precision == "bf16-const":
        import jax.numpy as jnp
        const_dtype = jnp.bfloat16
    out, dt, gold_override = run_tier(
        case, steps, args.tier, mesh_shape,
        capture=bool(args.dump_intermediates), with_w=args.with_w,
        const_dtype=const_dtype, inner_steps=args.inner_steps,
        fast=args.fast, halo_backend=args.halo_backend)

    if args.dump_intermediates:
        from pathlib import Path
        d = Path(args.dump_intermediates)
        d.mkdir(parents=True, exist_ok=True)
        for name, val in out.items():
            if name.endswith("_before_theta"):
                codec.write_field(d / f"{name}.bin", np.asarray(val))

    b = case.bounds
    n_pts = (b.ide - b.ids) * (b.jde - b.jds) * b.kdim * steps
    print(f"advance_mu_t [{args.tier}]: {steps} step(s) in {dt * 1e3:.3f} ms "
          f"({dt / steps * 1e3:.4f} ms/step, {n_pts / dt:.3e} grid-points/s)")

    failures = 0
    if gold_override is not None:
        for name in sorted(gold_override.keys() & out.keys()):
            r = compare(out[name], gold_override[name],
                        f"{name} (golden loop)", rtol=RTOL,
                        atol_scale=ATOL_SCALE)
            print(r)
            if not r.passed:
                failures += 1
    else:
        golden = fixtures.read_golden(args.fixture_dir, case.bounds)
        for name, fname in GOLDEN_FILES.items():
            r = compare(out[name], golden[name], fname, rtol=RTOL,
                        atol_scale=ATOL_SCALE)
            print(r)
            if not r.passed:
                failures += 1
    if failures:
        print(f"FAILED: {failures} field(s) outside tolerance")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
