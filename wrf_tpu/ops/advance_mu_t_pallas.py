"""advance_mu_t as a single fused Pallas TPU kernel.

One kernel invocation performs the whole small step — both phases, all seven
outputs — in one pass over HBM.  This is the framework's hot path; the pure
XLA path (advance_mu_t_jnp.py) materializes the big intermediates (dvdxi,
fluxes, wdtn) in HBM, while here they live entirely in VMEM/registers.

Kernel geometry (TPU-first, not a translation of the reference's
one-thread-per-column CUDA kernel, advance_mu_t_kernel.cu:16-198):

  * the grid tiles the OUTER j dimension only; each program owns a
    ``(TJ, K, I)`` slab — full vertical extent and full i rows, so the
    i±1 stencil is an in-register lane roll and the k reduction/scan is a
    chip-local loop over VMEM, with zero lane-halo padding waste;
  * j±1 neighbors inside a slab are axis-0 shifts; only the single rows
    beyond the slab edges arrive as extra 1-row element-offset block views
    (``pl.Element``) of the same HBM arrays, so each field is streamed
    from HBM ≈ once (the j-halo re-fetch is 1/TJ, not 2-3x as a naive
    shifted-view scheme would cost).  Mosaic double-buffers every view
    through its grid pipeline, overlapping the HBM streams with compute;
  * tile ``g`` computes rows ``[1+g*TJ, 1+(g+1)*TJ)`` so every view stays
    in bounds without edge padding (Mosaic does not support low padding);
    the first/last rows — always halo/ring rows — pass through untouched
    via input/output aliasing;
  * in/out fields (ww, t, t_ave, mu) are hard-aliased onto their outputs:
    no written array is read at j±1 by any view, so in-place tiling is
    race-free and the unwritten edge rows keep their input values free;
  * boundary conditions are masks computed in-kernel from the global
    window bounds (SMEM scalars), so the same program runs on every shard
    under shard_map (the shard passes its global row/lane offsets);
  * an optional wind-scale SMEM scalar multiplies u/v on load — the
    small-step loop uses it to model advance_uv's per-step wind updates
    without an extra XLA pass over u/v;
  * 2-D fields ride as ``(J, 1, I)`` so the j-tiled block shapes satisfy
    the TPU (sublane, lane) block constraints for any TJ.

Numerics are identical to the golden path (module_small_step_em.f90:7-252);
the k reduction/scan runs k-ascending (sequential in-VMEM loop for the
scan), matching the oracle's floating-point association.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = jnp.float32


def _k_range_mask(K: int, lo: int, hi: int) -> jax.Array:
    """(1, K, 1) mask selecting levels [lo, hi) — built from an iota
    (Pallas kernels cannot capture constant arrays)."""
    k = jax.lax.broadcasted_iota(jnp.int32, (1, K, 1), 1)
    return (k >= lo) & (k < hi)


def _kernel(
    # --- SMEM scalars -------------------------------------------------
    scal_ref,   # (1, 5) f32: rdx, rdy, dts, epssm, wind_scale
    win_ref,    # (1, 6) i32: i0, i1, j0, j1 (global window), j_off, i_off
    # --- 3-D center views (TJ, K, I), rows [1+g*TJ, 1+(g+1)*TJ) ---------
    ww_ref, ww1_ref, u_ref, u1_ref, v_ref, v1_ref,
    t_ref, t1_ref, tave_ref, ft_ref,
    # --- 3-D boundary rows (1, K, I) -------------------------------------
    v_hi_ref, v1_hi_ref,          # row after the slab (j+1 of the last row)
    t1_hi_ref, t1_lo_ref,         # rows after/before the slab
    # --- 2-D center views (TJ, 1, I) --------------------------------------
    mu_ref, mut_ref, muu_ref, muv_ref, mutend_ref,
    msfuy_ref, msfvxi_ref, msftx_ref, msfty_ref,
    # --- 2-D boundary rows (1, 1, I) ---------------------------------------
    muv_hi_ref, msfvxi_hi_ref,
    # --- 1-D vertical vectors (1, K) -----------------------------------
    dnw_ref, fnm_ref, fnp_ref, rdnw_ref,
    # --- outputs (TJ, K, I) / (TJ, 1, I) at the slab rows -----------------
    ww_out, t_out, tave_out,
    mu_out, muave_out, muts_out, mudf_out,
    # --- scratch ---------------------------------------------------------
    scan_ref,   # (TJ, K, I) VMEM: in-place ww vertical scan
    *,
    k0: int, k1: int, tj: int,
):
    rdx, rdy = scal_ref[0, 0], scal_ref[0, 1]
    dts, epssm = scal_ref[0, 2], scal_ref[0, 3]
    wscale = scal_ref[0, 4]
    K = ww_ref.shape[1]
    I = ww_ref.shape[2]

    # ---- window masks from global coordinates -------------------------
    g = pl.program_id(0)
    i_glob = jax.lax.broadcasted_iota(jnp.int32, (tj, 1, I), 2) + win_ref[0, 5]
    j_glob = (jax.lax.broadcasted_iota(jnp.int32, (tj, 1, I), 0)
              + win_ref[0, 4] + 1 + g * tj)
    mask = (
        (i_glob >= win_ref[0, 0]) & (i_glob <= win_ref[0, 1])
        & (j_glob >= win_ref[0, 2]) & (j_glob <= win_ref[0, 3])
    )  # (TJ, 1, I) — broadcasts over k

    def roll_i(x, shift):          # i±1 neighbor: lane roll (edges masked)
        return pltpu.roll(x, shift % I, 2)

    def roll_k(x, shift):          # k±1 neighbor: sublane roll
        return pltpu.roll(x, shift % K, 1)

    def shift_up(center, hi_row):  # rows r+1: in-slab shift + boundary row
        if center.shape[0] == 1:   # tj == 1: the boundary row IS the shift
            return hi_row
        return jnp.concatenate([center[1:], hi_row], axis=0)

    def shift_down(center, lo_row):  # rows r-1
        if center.shape[0] == 1:
            return lo_row
        return jnp.concatenate([lo_row, center[:-1]], axis=0)

    u = u_ref[:] * wscale
    v = v_ref[:] * wscale
    v_hi = v_hi_ref[:] * wscale
    t1 = t1_ref[:]

    # ---- Phase A: mass-flux divergence and column reduction -----------
    # association matches the golden path: v + (muv*v_1)*msfvx_inv,
    # u + (muu*u_1)/msfuy (module_small_step_em.f90:142-146)
    vflux = v + (muv_ref[:] * v1_ref[:]) * msfvxi_ref[:]
    vflux_b = v_hi + (muv_hi_ref[:] * v1_hi_ref[:]) * msfvxi_hi_ref[:]
    vflux_p = shift_up(vflux, vflux_b)
    uflux = u + (muu_ref[:] * u1_ref[:]) / msfuy_ref[:]
    msft2 = msftx_ref[:] * msfty_ref[:]
    dvdxi = msft2 * (
        rdy * (vflux_p - vflux) + rdx * (roll_i(uflux, -1) - uflux)
    )  # (TJ, K, I)

    dnw = dnw_ref[:].reshape(1, K, 1)
    dmdt = jnp.sum(
        jnp.where(_k_range_mask(K, k0, k1 + 1), dnw * dvdxi, F(0.0)),
        axis=1, keepdims=True,
    )  # (TJ, 1, I)

    # ---- mu update with epsilon off-centering -------------------------
    mu = mu_ref[:]
    tend = dmdt + mutend_ref[:]
    mu_new = mu + dts * tend
    mu_out[:] = jnp.where(mask, mu_new, mu)
    mudf_out[:] = jnp.where(mask, tend, F(0.0))
    muts_out[:] = jnp.where(mask, mut_ref[:] + mu_new, F(0.0))
    muave_out[:] = jnp.where(
        mask, F(0.5) * ((F(1.0) + epssm) * mu_new + (F(1.0) - epssm) * mu),
        F(0.0),
    )

    # ---- ww vertical scan (chip-local, k-ascending like the oracle) ---
    # ww(k) = ww(k-1) - dnw(k-1)*(dmdt + dvdxi(k-1) + mu_tend)/msfty,
    # integrated up from the input surface level, then ww -= ww_1.
    steps = -dnw * (dmdt + dvdxi + mutend_ref[:]) / msfty_ref[:]
    ww = ww_ref[:]
    # Scratch slot k is preloaded with step(k-1) (a k+1 shift); the loop then
    # turns slot k into ww(k) = ww(k-1) + step(k-1) in place, reading the
    # already-final slot k-1.  Mosaic only supports dynamic indexing on refs,
    # hence the scratch rather than a functional scan over values.
    scan_ref[:] = roll_k(steps, 1)
    scan_ref[:, k0 : k0 + 1, :] = ww[:, k0 : k0 + 1, :]

    def scan_body(k, _):
        scan_ref[:, pl.ds(k, 1), :] = (
            scan_ref[:, pl.ds(k - 1, 1), :] + scan_ref[:, pl.ds(k, 1), :]
        )
        return 0

    jax.lax.fori_loop(k0 + 1, k1 + 1, scan_body, 0)
    kmask_upd = _k_range_mask(K, k0, k1 + 1)
    ww_new = jnp.where(kmask_upd & mask, scan_ref[:] - ww1_ref[:], ww)
    ww_out[:] = ww_new

    # ---- Phase B: theta ------------------------------------------------
    t = t_ref[:]
    msfty = msfty_ref[:]
    t_half = t + (msfty * dts) * ft_ref[:]
    tave_out[:] = jnp.where(kmask_upd & mask, t, tave_ref[:])

    # vertical flux interpolant on w levels (zero at surface and domain top)
    fnm = fnm_ref[:].reshape(1, K, 1)
    fnp = fnp_ref[:].reshape(1, K, 1)
    wdtn = ww_new * (fnm * t1 + fnp * roll_k(t1, 1))
    wdtn = jnp.where(_k_range_mask(K, k0 + 1, k1 + 1), wdtn, F(0.0))
    vert = rdnw_ref[:].reshape(1, K, 1) * (roll_k(wdtn, -1) - wdtn)

    t1_jp = shift_up(t1, t1_hi_ref[:])
    t1_jm = shift_down(t1, t1_lo_ref[:])
    v_jp = shift_up(v, v_hi)
    fy = v_jp * (t1_jp + t1) - v * (t1 + t1_jm)
    fx = roll_i(u, -1) * (roll_i(t1, -1) + t1) - u * (t1 + roll_i(t1, 1))
    horiz = msftx_ref[:] * (F(0.5) * rdy * fy + F(0.5) * rdx * fx)
    t_new = t_half - (dts * msfty) * (horiz + vert)
    t_out[:] = jnp.where(kmask_upd & mask, t_new, t)


def _pick_tj(K: int, I: int) -> int:
    """Largest power-of-two j-tile whose double-buffered working set fits
    the ~16 MB scoped-VMEM budget: 10 input + 3 output (TJ,K,I) streams
    double-buffered, one scratch, plus thin boundary/2-D streams."""
    budget = 8 * 2**20
    per_tj = 4 * I * (27 * K + 30)
    for cand in (32, 16, 8, 4, 2):
        if cand * per_tj <= budget:
            return cand
    return 1


def _view(tj: int, K: int, I: int, shift: int):
    """All-Element BlockSpec for rows [1+g*tj+shift, +tj)."""
    return pl.BlockSpec(
        (pl.Element(tj), pl.Element(K), pl.Element(I)),
        lambda g, s=shift: (1 + g * tj + s, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _row_view(tj: int, K: int, I: int, row_shift: int):
    """Single-row (1, K, I) boundary view at row 1+g*tj+row_shift."""
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(K), pl.Element(I)),
        lambda g, s=row_shift: (1 + g * tj + s, 0, 0),
        memory_space=pltpu.VMEM,
    )


def advance_mu_t_pallas(
    *,
    ww, ww_1, u, u_1, v, v_1,
    mu, mut, muu, muv,
    t, t_1, t_ave, ft, mu_tend,
    rdx, rdy, dts, epssm,
    dnw, fnm, fnp, rdnw,
    msfuy, msfvx_inv, msftx, msfty,
    window,                       # (i0, i1, j0, j1) ints or traced scalars
    k0: int, k1: int, kde: int,   # static vertical bounds
    offsets=(0, 0),               # (j_off, i_off): this block's global origin
    wind_scale=1.0,               # multiplies u/v on load (see module doc)
    tj: int | None = None,
    interpret: bool = False,
):
    """Fused small step; same contract as ``advance_mu_t_core``.

    Arrays: 3-D ``(J, K, I)``, 2-D ``(J, I)``, vertical ``(K,)`` — all f32.
    The first and last j rows must be halo/ring rows (true of every memory
    window and of the sharded ring layout); they pass through unchanged.
    ``window`` is in the global coordinates defined by ``offsets``.  For
    peak throughput pass ``J - 2`` a multiple of ``tj`` and ``I`` a multiple
    of 128 (the wrapper otherwise pads and un-pads around the call).
    """
    del kde  # the k-range masks encode the domain top; kept for API parity
    J, K, I = ww.shape
    if tj is None:
        tj = _pick_tj(K, I)
    padj = (-(J - 2)) % tj

    f3 = [jnp.asarray(a, F) for a in (ww, ww_1, u, u_1, v, v_1, t, t_1, t_ave, ft)]
    f2 = [jnp.asarray(a, F)[:, None, :]
          for a in (mu, mut, muu, muv, mu_tend, msfuy, msfvx_inv, msftx, msfty)]
    if padj:
        f3 = [jnp.pad(a, ((0, padj), (0, 0), (0, 0))) for a in f3]
        f2 = [jnp.pad(a, ((0, padj), (0, 0), (0, 0))) for a in f2]
    Jp = J + padj
    (ww, ww_1, u, u_1, v, v_1, t, t_1, t_ave, ft) = f3
    (mu3, mut3, muu3, muv3, mutend3, msfuy3, msfvxi3, msftx3, msfty3) = f2
    kvecs = [jnp.asarray(a, F)[None, :] for a in (dnw, fnm, fnp, rdnw)]

    scal = jnp.stack([jnp.asarray(s, F)
                      for s in (rdx, rdy, dts, epssm, wind_scale)])[None, :]
    i0, i1, j0, j1 = window
    j_off, i_off = offsets
    win = jnp.stack([jnp.asarray(x, jnp.int32)
                     for x in (i0, i1, j0, j1, j_off, i_off)])[None, :]

    c3 = _view(tj, K, I, 0)
    c2 = _view(tj, 1, I, 0)
    r3 = functools.partial(_row_view, tj, K, I)
    r2 = functools.partial(_row_view, tj, 1, I)
    sk = pl.BlockSpec((1, K), lambda g: (0, 0), memory_space=pltpu.VMEM)
    ssc = pl.BlockSpec((1, 5), lambda g: (0, 0), memory_space=pltpu.SMEM)
    swin = pl.BlockSpec((1, 6), lambda g: (0, 0), memory_space=pltpu.SMEM)

    in_specs = [
        ssc, swin,
        c3, c3, c3, c3, c3, c3, c3, c3, c3, c3,   # 10 3-D center views
        r3(tj), r3(tj), r3(tj), r3(-1),            # v_hi, v1_hi, t1_hi, t1_lo
        c2, c2, c2, c2, c2, c2, c2, c2, c2,        # 9 2-D center views
        r2(tj), r2(tj),                            # muv_hi, msfvxi_hi
        sk, sk, sk, sk,
    ]
    out_specs = [c3, c3, c3, c2, c2, c2, c2]
    out_shape = [jax.ShapeDtypeStruct((Jp, K, I), F)] * 3 + \
                [jax.ShapeDtypeStruct((Jp, 1, I), F)] * 4

    kernel = functools.partial(_kernel, k0=k0, k1=k1, tj=tj)
    # aliases: ww->ww_out, t->t_out, t_ave->tave_out, mu->mu_out
    # (input indices: 0 scal, 1 win, 2 ww, .., 8 t, 10 t_ave, 16 mu)
    ww_o, t_o, tave_o, mu_o, muave_o, muts_o, mudf_o = pl.pallas_call(
        kernel,
        grid=((Jp - 2) // tj,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((tj, K, I), F)],
        input_output_aliases={2: 0, 8: 1, 10: 2, 16: 3},
        interpret=interpret,
    )(
        scal, win,
        ww, ww_1, u, u_1, v, v_1, t, t_1, t_ave, ft,
        v, v_1, t_1, t_1,
        mu3, mut3, muu3, muv3, mutend3, msfuy3, msfvxi3, msftx3, msfty3,
        muv3, msfvxi3,
        *kvecs,
    )

    # pure 2-D outputs: zero the never-computed edge rows (cheap, 2-D only)
    zero2 = jnp.zeros((1, I), F)

    def edges2z(out):
        o = out[:, 0, :]
        return jnp.concatenate([zero2, o[1 : J - 1], zero2], axis=0)

    return {
        "ww": ww_o[:J],
        "mu": mu_o[:J, 0, :],
        "muave": edges2z(muave_o),
        "muts": edges2z(muts_o),
        "mudf": edges2z(mudf_o),
        "t": t_o[:J],
        "t_ave": tave_o[:J],
    }
