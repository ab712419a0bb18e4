"""Temporally-blocked advance_mu_t: S acoustic substeps per Pallas pass.

The device-resident mu_t loop (parallel/sharded.py) is purely HBM-bound:
ablating ALL in-kernel compute does not change the measured step time, so
the only remaining lever is removing streams.  The single-substep scan
kernel (advance_mu_t_pallas, lean+lite mode) already carries the minimum
per-substep state — but it still re-reads every constant base field
(u, v, t_1, tconst, dvdxi_const) from HBM on every substep.

This kernel exploits the loop's dependency structure (SURVEY.md §3.4):
consecutive mu_t substeps interact ONLY pointwise —

  * t feeds the next substep at the same (i, k, j) (phase B reads t at
    center only; all stencil neighbors are of the constant t_1 base),
  * mu is updated pointwise (dmdt depends on winds, not mu),
  * ww is consumed only through its k0 scan-seed row (lite mode), and
  * the winds are read-only here, modelled per-substep by the wind_scale
    ramp (the fused-wind feedback loop lives in models/small_step.py and
    keeps the single-substep kernel).

With no cross-column, cross-row coupling between substeps, a j-tile can
run S whole substeps in VMEM before touching HBM again: constants stream
once per S substeps instead of once per substep, and only the carried
state (t; thin 2-D mu and the ww seed row) is written back.  This is
classic temporal blocking, done the TPU way — no halo widening or
trapezoid recompute is needed because the blocked loop has no spatial
dependence at all.

Per-substep HBM traffic (512x512x50, f32): single-step lean kernel moves
~7 field-passes; this kernel moves ~(6 reads + 1 write)/S + 1 t-pass,
i.e. ~2.5 passes at S=4.  The arithmetic per substep is IDENTICAL to the
single-step kernel's lean path, term by term and in the same association
(the per-step wind scale multiplies u/v elementwise before differencing,
exactly as the single-step kernel scales on load), so the blocked loop is
bit-compatible with S sequential single-step calls.

Reference parity: same numerics as module_small_step_em.f90:140-248 via
the lean folding documented in advance_mu_t_pallas.lean_constants.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .advance_mu_t_pallas import (
    _compiler_params, _k_range_mask, _pick_tj, _row_view, _view,
    ablate_from_env,
)

F = jnp.float32


# ------------------------------------------------------------------ #
# In-kernel helpers shared VERBATIM by the S=2 pair kernel and the
# depth-S trapezoid (identical FP association — hoisting them here is
# bit-preserving; a numerics change lands in both paths at once).
# ------------------------------------------------------------------ #
def _reg_scan() -> bool:
    """WRF_TPU_REGSCAN=1: run the exact sequential ww scan as a
    register chain instead of scratch sweeps — same adds in the same
    order (one deep pass is bit-identical), but the materialization
    shift moves XLA fusion boundaries in the surrounding theta
    arithmetic, so multi-pass runs sit in the trapezoid's last-ulp
    tolerance class rather than bit-equality.  Trace-time A/B knob,
    like WRF_TPU_DEEP_UNROLL; measured SLOWER on chip (see ww_scan),
    kept as the documented falsified attempt."""
    return os.environ.get("WRF_TPU_REGSCAN", "0") != "0"


def _phase_helpers(*, scan_ref, roll_i, roll_k, kmask_upd, kmask_w, mask_c,
                   tcon, interp, rdnw3, t1c, t1_jp, t1_jm, t1_ip, t1_im,
                   msftx, msfty, rdx, rdy, dts, fast_scan, K, k0, k1,
                   lc=None, ablate: str = "", unroll: bool = False,
                   regscan_ok: bool = False):
    """(ww_scan, theta): the seeded vertical ww scan (sequential in-VMEM
    fori_loop, or the re-associated log-depth masked cumsum under
    ``fast_scan``) and the center-row theta update.

    ``lc`` (lane-tiled kernels only) slices a halo-wide lane block down
    to the tile's center lanes; the identity otherwise.  With it, theta
    computes the horizontal fluxes on the WIDE blocks (the t_1/u/v lane
    stencils need the halo lanes) and slices before the center-width t
    update — all other operands (t, tconst, ww seed, masks) arrive
    center-width, so the theta/ww/w phases never touch halo lanes."""
    if lc is None:
        def lc(x):
            return x
    def scan_body(k, _):
        scan_ref[:, pl.ds(k, 1), :] = (
            scan_ref[:, pl.ds(k - 1, 1), :] + scan_ref[:, pl.ds(k, 1), :]
        )
        return 0

    if fast_scan:
        kiota = jax.lax.broadcasted_iota(jnp.int32, (1, K, 1), 1)

    def ww_scan(steps, seed):
        if fast_scan:
            y = jnp.where(kmask_w, roll_k(steps, 1), F(0.0))
            d = 1
            while d < K:
                y = y + jnp.where(kiota >= d, roll_k(y, d), F(0.0))
                d *= 2
            return jnp.where(kmask_upd & mask_c, seed + y, F(0.0))
        if regscan_ok and _reg_scan() and "noscan" not in ablate:
            # register-chain form: the IDENTICAL left-to-right adds
            # (bit-equal to the scratch sweeps) but the running row
            # stays a value — no scratch read-modify-write per level;
            # one concat materializes the (tj, K, I) result.
            # WRF_TPU_REGSCAN=1 A/B knob; DEEP kernel only
            # (``regscan_ok``) — the pair kernel's callers consume
            # scan_ref's post-scan contents, which this form never
            # writes.  Chip A/B 2026-08-20: LOSES on the deep coupled
            # kernel (0.556 vs 0.526 ms/substep at 512^2 S=4 tj=12),
            # so the scratch sweep stays the default and the knob
            # survives as the documented falsified attempt.
            stepped = roll_k(steps, 1)
            rows = [seed]
            for k in range(k0 + 1, k1 + 1):
                rows.append(rows[-1] + stepped[:, k : k + 1, :])
            parts = []
            if k0:
                parts.append(jnp.zeros_like(stepped[:, :k0, :]))
            parts.extend(rows)
            if k1 + 1 < K:
                parts.append(jnp.zeros_like(stepped[:, k1 + 1 :, :]))
            y = jnp.concatenate(parts, axis=1)
            return jnp.where(kmask_upd & mask_c, y, F(0.0))
        scan_ref[:] = roll_k(steps, 1)
        scan_ref[:, k0 : k0 + 1, :] = seed
        # "scan2x" (WRF_TPU_ABLATE slack-attribution arm): run the
        # sequential chain TWICE.  Unlike the removal arms (noscan),
        # duplication keeps the surrounding schedule intact, so the
        # measured delta is the chain's EXPOSED (non-overlapped) cost —
        # if it matches the noscan delta the scan is fully serial-
        # exposed and there is no pipeline slack to claim; ref writes
        # are side effects, so Mosaic cannot elide the second pass
        # (output is double-scanned: non-physical by design).
        reps = 2 if "scan2x" in ablate else 1
        if "noscan" not in ablate:   # perf-debug (WRF_TPU_ABLATE)
            for _ in range(reps):
                if unroll or "unroll" in ablate:
                    # STATIC-slice unrolled sequential adds — the exact
                    # association/op sequence of the fori_loop.
                    # Mandatory under lane tiling (pl.ds dynamic
                    # sublane indexing faults the TPU when composed
                    # with the 2-D windowed grid —
                    # tools/probe_2d_bisect.py rung h vs j) and the
                    # DEFAULT for the deep coupled kernel since the
                    # chip A/B measured it faster (CONUS S=4: 4.078 ->
                    # 4.006 ms/substep, 2026-08-20); fori kept for the
                    # other kernels and as the WRF_TPU_ABLATE=
                    # unroll-free arm.
                    for k in range(k0 + 1, k1 + 1):
                        scan_ref[:, k : k + 1, :] = (
                            scan_ref[:, k - 1 : k, :]
                            + scan_ref[:, k : k + 1, :])
                else:
                    jax.lax.fori_loop(k0 + 1, k1 + 1, scan_body, 0)
        return jnp.where(kmask_upd & mask_c, scan_ref[:], F(0.0))

    def theta(t_in, u, v_c, v_p, ww_new):
        t_half = t_in + tcon
        if "nophaseb" in ablate:     # perf-debug ablation
            return jnp.where(kmask_upd & mask_c, t_half, t_in)
        wdtn = jnp.where(kmask_w, ww_new * interp, F(0.0))
        vert = rdnw3 * (roll_k(wdtn, -1) - wdtn)
        fy = v_p * (t1_jp + t1c) - v_c * (t1c + t1_jm)
        fx = roll_i(u, -1) * (t1_ip + t1c) - u * (t1c + t1_im)
        horiz = msftx * lc(F(0.5) * rdy * fy + F(0.5) * rdx * fx)
        t_new = jnp.where(kmask_upd & mask_c,
                         t_half - (dts * msfty) * (horiz + vert), t_in)
        if "theta2x" in ablate:
            # slack-attribution arm (see scan2x): a second full theta
            # pass with operands swapped (same op count, same streams,
            # different values so CSE cannot merge it), consumed
            # through a practically-false select so DCE cannot drop it
            # — the delta vs exact is theta's EXPOSED cost
            wdtn2 = jnp.where(kmask_w, ww_new * rdnw3, F(0.0))
            vert2 = interp * (roll_k(wdtn2, 1) - wdtn2)
            fy2 = v_p * (t1_jm + t1c) - v_c * (t1c + t1_jp)
            fx2 = roll_i(u, -1) * (t1_im + t1c) - u * (t1c + t1_ip)
            horiz2 = msftx * lc(F(0.5) * rdx * fy2 + F(0.5) * rdy * fx2)
            t_alt = t_half - (dts * msfty) * (horiz2 + vert2)
            t_new = jnp.where(jnp.abs(t_alt) > F(1e30), t_alt, t_new)
        return t_new

    return ww_scan, theta


def _w_solver(*, scan_ref, dpw_ref, aw_ref, cpv_ref, denv_ref,
              crdn_ref, erdn_ref, roll_k, kmask_upd, kmask_w, mask_c,
              rdnw3, K, k0, k1, epssm, c_w, g_t,
              fast_solve=False, fws_ref=None, fwp_ref=None,
              bws_ref=None, bwp_ref=None, unroll: bool = False,
              ablate: str = ""):
    """w_step: the fused vertically-implicit w/pp substep — column-local
    Thomas solve, pointwise in (i, j), identical to the single-step
    kernel's fuse_w block (advance_mu_t_pallas._kernel); ``scan_ref``
    doubles as rhs storage (its ww values are already consumed).  The
    c'/denominator elimination recurrence is constant across columns and
    substeps — hoisted to K-vectors by the wrappers (_thomas_hoisted,
    value-preserving), so the forward sweep is one FMA + one divide per
    level and there is no (tj, K, I) c' scratch.

    ``fast_solve`` (the ``fast`` tolerance class, like the re-associated
    ww cumsum): both Thomas sweeps are first-order affine recurrences
    with LEVEL-CONSTANT coefficients, so each collapses to a scaled
    masked log-depth cumsum — dpw[k] = P_k * sum_{j<=k} rhs_j/(den_j P_j)
    with P_k the cumulative product of a_k/den_k (and the mirrored form
    for the back-substitution).  The scale vectors (fws = 1/(den P),
    fwp = P, bws = 1/M, bwp = M) are hoisted host-side
    (_thomas_fast_vectors); the two 100-iteration sequential row sweeps
    become ~2 log2(K) full-block VPU ops.  Absolute error is a few ulp
    of the dominant rhs scale (contributions of level j on level k carry
    weight P_k/P_j <= 1, so the scaling never amplifies)."""
    beta = F(0.5) * (F(1.0) + epssm)
    alfa = F(1.0) - beta
    crdn = crdn_ref[:].reshape(1, K, 1)
    erdn = erdn_ref[:].reshape(1, K, 1)
    if fast_solve:
        kiota = jax.lax.broadcasted_iota(jnp.int32, (1, K, 1), 1)
        fws = fws_ref[:].reshape(1, K, 1)
        fwp = fwp_ref[:].reshape(1, K, 1)
        bws = bws_ref[:].reshape(1, K, 1)
        bwp = bwp_ref[:].reshape(1, K, 1)

        def cumsum_incl(x):          # y[k] = sum_{j<=k} x[j]
            y = x
            d = 1
            while d < K:
                y = y + jnp.where(kiota >= d, roll_k(y, d), F(0.0))
                d *= 2
            return y

        def revcumsum_incl(x):       # y[k] = sum_{j>=k} x[j]
            y = x
            d = 1
            while d < K:
                y = y + jnp.where(kiota < K - d, roll_k(y, -d), F(0.0))
                d *= 2
            return y

    def w_fwd(k, _):
        dpw_ref[:, pl.ds(k, 1), :] = (
            scan_ref[:, pl.ds(k, 1), :]
            + aw_ref[0, k] * dpw_ref[:, pl.ds(k - 1, 1), :]
        ) / denv_ref[0, k]
        return 0

    def w_bwd(m, _):
        k = k1 - 1 - m
        dpw_ref[:, pl.ds(k, 1), :] = (
            dpw_ref[:, pl.ds(k, 1), :]
            - cpv_ref[0, k] * dpw_ref[:, pl.ds(k + 1, 1), :]
        )
        return 0

    def w_step(wf, ppf, t_full):
        if "nowstep" in ablate:      # perf-debug (WRF_TPU_ABLATE):
            # the whole implicit substep deleted — w/pp pass through
            # (still streamed as carried state), isolating the
            # w-subsystem's pure stream cost
            return wf, ppf
        w_act = jnp.where(kmask_w, wf, F(0.0))
        dvz = jnp.where(kmask_upd,
                        rdnw3 * (roll_k(w_act, -1) - w_act), F(0.0))
        rhs = (wf - crdn * (ppf - roll_k(ppf, 1))
               + erdn * (dvz - roll_k(dvz, 1)) + g_t * t_full)
        if "nosolve" in ablate:      # perf-debug (WRF_TPU_ABLATE):
            # the two sequential Thomas sweeps deleted; rhs compute,
            # masks and the pp update all stay — the delta vs exact is
            # the sweeps' exposed cost
            w_sol = rhs
        elif fast_solve:
            # scale vectors are zero outside the interior band, so the
            # cumsums see only band levels; w_sol outside the band is 0
            # and masked away below
            dpw_val = fwp * cumsum_incl(rhs * fws)
            w_sol = bwp * revcumsum_incl(dpw_val * bws)
        else:
            scan_ref[:] = rhs
            dpw_ref[:, k0 : k0 + 1, :] = jnp.zeros_like(wf[:, :1, :])
            if unroll:
                # static-slice unrolled Thomas sweeps (see the ww scan's
                # unroll note: pl.ds + 2-D windowed grid faults)
                for k in range(k0 + 1, k1 + 1):
                    dpw_ref[:, k : k + 1, :] = (
                        scan_ref[:, k : k + 1, :]
                        + aw_ref[0, k] * dpw_ref[:, k - 1 : k, :]
                    ) / denv_ref[0, k]
                for k in range(k1 - 1, k0, -1):
                    dpw_ref[:, k : k + 1, :] = (
                        dpw_ref[:, k : k + 1, :]
                        - cpv_ref[0, k] * dpw_ref[:, k + 1 : k + 2, :])
            else:
                jax.lax.fori_loop(k0 + 1, k1 + 1, w_fwd, 0)
                jax.lax.fori_loop(0, k1 - 1 - k0, w_bwd, 0)
            w_sol = dpw_ref[:]
        w_new = jnp.where(kmask_w & mask_c, w_sol, wf)
        wn_act = jnp.where(kmask_w, w_sol, F(0.0))
        dvz_new = jnp.where(kmask_upd,
                            rdnw3 * (roll_k(wn_act, -1) - wn_act),
                            F(0.0))
        pp_new = jnp.where(kmask_upd & mask_c,
                           ppf - c_w * (beta * dvz_new + alfa * dvz),
                           ppf)
        return w_new, pp_new

    return w_step


def _thomas_coeffs(rdn, rdnw, dts, epssm, cw, gw, K, k0, k1):
    """Host-side Thomas coefficients of the implicit w/pp system —
    FP association copied from the single-step wrapper
    (advance_mu_t_pallas.advance_mu_t_pallas); shared by both blocked
    coupled wrappers.  Returns (c_w, g_t, a, b, diag, crdn, erdn)."""
    dts_f = jnp.asarray(dts, F)
    epssm_f = jnp.asarray(epssm, F)
    c_w = jnp.asarray(cw, F) * dts_f
    g_t = dts_f * jnp.asarray(gw, F)
    beta_h = jnp.float32(0.5) * (jnp.float32(1.0) + epssm_f)
    alfa_h = jnp.float32(1.0) - beta_h
    cb = c_w * beta_h
    rdn_a = jnp.asarray(rdn, F)
    rdnw_a = jnp.asarray(rdnw, F)
    kv = jnp.arange(K)
    kintv = (kv > k0) & (kv <= k1)
    a_vec = jnp.where(kintv, ((cb * cb) * rdn_a) * jnp.roll(rdnw_a, 1),
                      jnp.float32(0.0))
    b_vec = jnp.where(kintv, ((cb * cb) * rdn_a) * rdnw_a,
                      jnp.float32(0.0))
    diag_vec = (jnp.float32(1.0) + a_vec) + b_vec
    crdn_vec = c_w * rdn_a
    erdn_vec = ((c_w * beta_h) * (c_w * alfa_h)) * rdn_a
    return c_w, g_t, a_vec, b_vec, diag_vec, crdn_vec, erdn_vec


def _thomas_hoisted(a_vec, b_vec, diag_vec):
    """Hoist the Thomas forward-elimination c'/denominator recurrence —
    constant across columns and substeps — to K-vectors:
    ``den_k = diag_k + a_k * c'_{k-1}``, ``c'_k = -b_k / den_k`` with
    ``c'`` seeded at 0, the same f32 ops in the same order the in-kernel
    per-column recurrence performs (scalar instead of broadcast, so the
    hoist is value-preserving).  Outside the interior band ``a = b = 0``
    and ``diag = 1``, so ``den = 1`` / ``c' = 0`` fall out without
    masking (and the kernel never indexes those levels anyway)."""
    def step(cp_prev, abd):
        a_k, b_k, d_k = abd
        den = d_k + a_k * cp_prev
        cp = -b_k / den
        return cp, (cp, den)

    _, (cp_vec, den_vec) = jax.lax.scan(
        step, jnp.float32(0.0), (a_vec, b_vec, diag_vec))
    return cp_vec, den_vec


def _thomas_fast_vectors(a_vec, cp_vec, den_vec, K, k0, k1):
    """Scale vectors for the log-depth (``fast``) Thomas solve — see
    ``_w_solver``.  Forward: dpw[k] = P_k * cumsum(rhs/(den P)) with
    P_k = prod of alpha = a/den over the interior band; backward:
    w[k] = M_k * revcumsum(dpw/M) with M_k = prod of (-c') from k up to
    the band top.  Both alpha and -c' are < 1 in magnitude (diagonal
    dominance), so P/M decay geometrically — at K = 50 and alpha ~ 0.75
    the smallest P is ~5e-20, comfortably inside f32; beyond K ~ 120
    interior levels the products would leave f32 range and the exact
    sequential solve must be used instead (documented constraint; the
    NaN tripwires catch a violation immediately)."""
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    kv = jnp.arange(K)
    band = (kv > k0) & (kv <= k1)
    alpha = jnp.where(band, a_vec / den_vec, one)
    P = jnp.cumprod(alpha)
    fws = jnp.where(band, one / (den_vec * P), zero)
    fwp = jnp.where(band, P, zero)
    mm = jnp.where((kv > k0) & (kv < k1), -cp_vec, one)
    M = jnp.cumprod(mm[::-1])[::-1]
    bws = jnp.where(band, one / M, zero)
    bwp = jnp.where(band, M, zero)
    return fws, fwp, bws, bwp


def _kernel(*refs, k0: int, k1: int, tj: int, n_inner: int,
            has_wscale: bool, fast: bool = False, ablate: str = ""):
    it = iter(refs)
    scal_ref = next(it)   # (1, 6) f32: rdx, rdy, dts, epssm, w0, dw
    win_ref = next(it)    # (1, 6) i32: i0, i1, j0, j1, j_off, i_off
    # 3-D center views (TJ, K, I)
    u_ref, v_ref, t_ref, t1_ref = next(it), next(it), next(it), next(it)
    tconst_ref, dvdxic_ref = next(it), next(it)
    # 3-D boundary rows (1, K, I)
    v_hi_ref, t1_hi_ref, t1_lo_ref = next(it), next(it), next(it)
    # 2-D center views (TJ, 1, I)
    wwrow_ref, ww1k0_ref = next(it), next(it)
    mu_ref, mutend_ref = next(it), next(it)
    msftx_ref, msfty_ref = next(it), next(it)
    # 1-D vertical vectors (1, K)
    dnw_ref, fnm_ref, fnp_ref, rdnw_ref = next(it), next(it), next(it), next(it)
    # outputs
    t_out, mu_out, wwrow_out = next(it), next(it), next(it)
    scan_ref = next(it)   # (TJ, K, I) VMEM scratch: in-place ww scan

    rdx, rdy = scal_ref[0, 0], scal_ref[0, 1]
    dts = scal_ref[0, 2]
    K = t1_ref.shape[1]
    I = t1_ref.shape[2]

    g = pl.program_id(0)
    i_glob = jax.lax.broadcasted_iota(jnp.int32, (tj, 1, I), 2) + win_ref[0, 5]
    j_glob = (jax.lax.broadcasted_iota(jnp.int32, (tj, 1, I), 0)
              + win_ref[0, 4] + 1 + g * tj)
    i0w, i1w = win_ref[0, 0], win_ref[0, 1]
    j0w, j1w = win_ref[0, 2], win_ref[0, 3]
    mask = ((i_glob >= i0w) & (i_glob <= i1w)
            & (j_glob >= j0w) & (j_glob <= j1w))   # (TJ, 1, I)

    def roll_i(x, shift):
        return pltpu.roll(x, shift % I, 2)

    def roll_k(x, shift):
        return pltpu.roll(x, shift % K, 1)

    def shift_up(center, hi_row):
        if center.shape[0] == 1:
            return hi_row
        return jnp.concatenate([center[1:], hi_row], axis=0)

    def shift_down(center, lo_row):
        if center.shape[0] == 1:
            return lo_row
        return jnp.concatenate([lo_row, center[:-1]], axis=0)

    def _ld(ref):   # constant streams may ride HBM as bf16; compute is f32
        return ref[:].astype(F)

    # ---- once-per-pass loads and invariants ---------------------------
    u0 = _ld(u_ref)
    v0 = _ld(v_ref)
    v_hi0 = _ld(v_hi_ref)
    t1 = _ld(t1_ref)
    tconst = _ld(tconst_ref)
    dvdxic = _ld(dvdxic_ref)
    msft2 = msftx_ref[:] * msfty_ref[:]
    inv_msfty = F(1.0) / msfty_ref[:]
    dnw = dnw_ref[:].reshape(1, K, 1)
    fnm = fnm_ref[:].reshape(1, K, 1)
    fnp = fnp_ref[:].reshape(1, K, 1)
    rdnw3 = rdnw_ref[:].reshape(1, K, 1)
    # neighbor views of the constant theta base (phase B's only stencils)
    t1_jp = shift_up(t1, _ld(t1_hi_ref))
    t1_jm = shift_down(t1, _ld(t1_lo_ref))
    t1_ip = roll_i(t1, -1)
    t1_im = roll_i(t1, 1)
    interp = fnm * t1 + fnp * roll_k(t1, 1)   # wdtn = ww * interp
    kmask_upd = _k_range_mask(K, k0, k1 + 1)
    kmask_w = _k_range_mask(K, k0 + 1, k1 + 1)
    ww1k0 = ww1k0_ref[:]
    mutend = mutend_ref[:]
    msftx = msftx_ref[:]
    msfty = msfty_ref[:]

    # ---- carried state (lives in VMEM/registers across the S steps) ---
    t_st = t_ref[:]
    mu_st = mu_ref[:]
    seed = wwrow_ref[:]

    def scan_body(k, _):
        scan_ref[:, pl.ds(k, 1), :] = (
            scan_ref[:, pl.ds(k - 1, 1), :] + scan_ref[:, pl.ds(k, 1), :]
        )
        return 0

    if fast:
        # ---- fast mode: re-associated f32 (tolerance-gated like the
        # XLA tier; NOT bit-compatible with the sequential path).
        #
        # The prescribed-wind substep is AFFINE in (1, s, ws):
        # ws(s) = w0 + s*dw is the only thing that changes between
        # substeps on the mu/ww side (the winds are read-only here; the
        # wind-feedback loop lives in models/small_step.py), and the
        # theta update reads the carried t only pointwise at center.  So
        # every per-substep field decomposes as X(s) = Xc + ws*Xd, the
        # masked ww cumsum — a LINEAR operator — hoists out of the
        # substep loop entirely (cumsum of an affine function is the
        # affine function of the two cumsums), and the whole theta
        # increment collapses to dt(s) = G0 + s*G1 + ws*G2 with G*
        # precomputed once per pass.  Per-substep work: ~3 VPU
        # FMA-passes for t plus thin 2-D mu/seed updates — classic
        # loop-invariant code motion, done at the Pallas level where
        # XLA cannot see across the sequential substep structure.
        v_p0 = shift_up(v0, v_hi0)
        dvdxi_dyn = msft2 * (
            rdy * (v_p0 - v0) + rdx * (roll_i(u0, -1) - u0))
        fy0 = v_p0 * (t1_jp + t1) - v0 * (t1 + t1_jm)
        fx0 = roll_i(u0, -1) * (t1_ip + t1) - u0 * (t1 + t1_im)
        horiz0 = msftx * (F(0.5) * rdy * fy0 + F(0.5) * rdx * fx0)
        kiota = jax.lax.broadcasted_iota(jnp.int32, (1, K, 1), 1)

        def kcumsum(steps):
            # masked log-depth Hillis-Steele cumsum over k:
            # y(k) = sum_{m<k} steps(m) on [k0+1, k1]
            y = jnp.where(kmask_w, roll_k(steps, 1), F(0.0))
            if "noscan" not in ablate:   # perf-debug (WRF_TPU_ABLATE)
                d = 1
                while d < K:
                    y = y + jnp.where(kiota >= d, roll_k(y, d), F(0.0))
                    d *= 2
            return y

        # phase A affine split: dvdxi(s) = dvdxic + ws*dvdxi_dyn
        dmdt_c = jnp.sum(jnp.where(kmask_upd, dnw * dvdxic, F(0.0)),
                         axis=1, keepdims=True)
        dmdt_d = jnp.sum(jnp.where(kmask_upd, dnw * dvdxi_dyn, F(0.0)),
                         axis=1, keepdims=True)
        y_c = kcumsum((-dnw * (dmdt_c + dvdxic + mutend)) * inv_msfty)
        y_d = kcumsum((-dnw * (dmdt_d + dvdxi_dyn)) * inv_msfty)
        # ww(s) = P3 * (seed_s + y_c + ws*y_d), seed_s = seed0 - s*ww1k0
        # wdtn(s) = Ic * (seed0 + y_c) + s*(-Ic*ww1k0) + ws*(Ic*y_d)
        p3 = kmask_upd & mask
        Ic = jnp.where(kmask_w & p3, interp, F(0.0))
        wA = Ic * (seed + y_c)
        wB = -(Ic * ww1k0)
        wC = Ic * y_d

        def dvert(x):
            return rdnw3 * (roll_k(x, -1) - x)

        dm = dts * msfty
        if "nophaseb" in ablate:     # perf-debug ablation
            G0, G1, G2 = tconst, F(0.0), F(0.0)
        else:
            G0 = tconst - dm * dvert(wA)
            G1 = -(dm * dvert(wB))
            G2 = -(dm * (horiz0 + dvert(wC)))

        # closed-form sum over the S substeps: every increment above is
        # affine in (1, s, ws) and independent of the carried state, so
        # sum_{s=0}^{S-1} (G0 + s*G1 + ws*G2) collapses to one FMA with
        # the scalar sums S, S(S-1)/2 and sum(ws) — the logical endpoint
        # of the loop-invariant motion (one re-associated add instead of
        # S sequential adds; same fast-mode tolerance class, and the
        # single summed add typically rounds LESS).  Per-pass cost is
        # now streams + precompute only; per-substep cost divides by S.
        sn = F(n_inner)
        ss = F(n_inner * (n_inner - 1) // 2)
        # sum_s ws(s) = S + (S*step0 + S(S-1)/2) * dw under the
        # ws = 1 + (step0+s)*dw ramp
        sws = (sn + (sn * scal_ref[0, 4] + ss) * scal_ref[0, 5]
               if has_wscale else sn)
        t_st = jnp.where(p3, t_st + (sn * G0 + ss * G1 + sws * G2), t_st)
        mu_st = jnp.where(
            mask,
            mu_st + dts * (sn * (dmdt_c + mutend) + sws * dmdt_d),
            mu_st)
        seed = jnp.where(mask, seed - sn * ww1k0, seed)

        t_out[:] = t_st
        mu_out[:] = mu_st
        wwrow_out[:] = seed
        return

    for s in range(n_inner):
        # per-substep wind scale, multiplied elementwise BEFORE the flux
        # differences — the same association as the single-step kernel's
        # on-load scaling, so the blocked loop stays bit-compatible
        if has_wscale:
            # ws(s) = 1 + (step0 + s)*dw — the SAME f32 association as
            # the single-step path's wscale_at(n) (n = step0 + s is an
            # exact small-int f32 sum), so the per-substep scale is
            # bit-identical to S sequential single-step calls at ANY
            # block index (the old ws0 + s*dw form double-rounded for
            # blocks past the first: fl(fl(1+n0*dw) + s*dw) !=
            # fl(1 + (n0+s)*dw))
            ws = F(1.0) + (scal_ref[0, 4] + F(s)) * scal_ref[0, 5]
            u = u0 * ws
            v = v0 * ws
            v_hi = v_hi0 * ws
        else:
            u, v, v_hi = u0, v0, v_hi0
        v_p = shift_up(v, v_hi)

        # Phase A: dynamic mass-flux divergence over the static fold
        dvdxi = dvdxic + msft2 * (
            rdy * (v_p - v) + rdx * (roll_i(u, -1) - u)
        )
        dmdt = jnp.sum(jnp.where(kmask_upd, dnw * dvdxi, F(0.0)),
                       axis=1, keepdims=True)
        tend = dmdt + mutend
        mu_st = jnp.where(mask, mu_st + dts * tend, mu_st)

        # ww vertical scan
        steps = (-dnw * (dmdt + dvdxi + mutend)) * inv_msfty
        scan_ref[:] = roll_k(steps, 1)
        scan_ref[:, k0 : k0 + 1, :] = seed
        if "noscan" not in ablate:   # perf-debug (WRF_TPU_ABLATE)
            if "unroll" in ablate:   # exact static-slice A/B arm
                for k in range(k0 + 1, k1 + 1):
                    scan_ref[:, k : k + 1, :] = (
                        scan_ref[:, k - 1 : k, :]
                        + scan_ref[:, k : k + 1, :])
            else:
                jax.lax.fori_loop(k0 + 1, k1 + 1, scan_body, 0)
        ww_new = jnp.where(kmask_upd & mask, scan_ref[:], F(0.0))
        seed = jnp.where(mask, seed - ww1k0, seed)

        # Phase B: theta
        t_half = t_st + tconst
        wdtn = jnp.where(kmask_w, ww_new * interp, F(0.0))
        vert = rdnw3 * (roll_k(wdtn, -1) - wdtn)
        fy = v_p * (t1_jp + t1) - v * (t1 + t1_jm)
        fx = roll_i(u, -1) * (t1_ip + t1) - u * (t1 + t1_im)
        horiz = msftx * (F(0.5) * rdy * fy + F(0.5) * rdx * fx)
        t_new = t_half - (dts * msfty) * (horiz + vert)
        if "nophaseb" in ablate:     # perf-debug ablation
            t_new = t_half
        t_st = jnp.where(kmask_upd & mask, t_new, t_st)

    t_out[:] = t_st
    mu_out[:] = mu_st
    wwrow_out[:] = seed


def multistep_tile_params(K: int, ni_loc: int, tj: int | None = None,
                          const_bf16: bool = False):
    """(tj, vmem_limit) for the temporally-blocked kernel.

    Reuses the single-step picker's measured-safe vmem-limit region
    (see advance_mu_t_pallas.sharded_tile_params); the stream budget adds
    the blocked loop's extra LIVE invariants (t1 neighbor views + interp
    + dvdxi_const all stay resident across the S steps) on top of the
    operand streams.  streams=84 is MEASURED (tools/msteps_tune.py,
    512x512x50, S=8): it lands tj=6, the best of the chip tj sweep
    (tj=6: 0.3585 ms/substep; tj=5: 0.3700; tj=7: 0.3685-0.4217 across
    runs; tj=9: 0.3770; tj=12: 0.4007) — past S=8 the kernel is
    compute-bound (ablations: scan ~0.125, phase B ~0.115, streams
    ~0.08 ms), so smaller tiles that keep scoped VMEM low win.
    ``const_bf16`` no longer changes the pick: both precisions sit on
    the same compute-bound floor."""
    from .advance_mu_t_pallas import sharded_tile_params

    del const_bf16
    return sharded_tile_params(K, ni_loc, tj, streams=84)


def advance_mu_t_multistep_pallas(
    *,
    u, v, t, t_1, tconst, dvdxi_const, ww1_k0, ww_row,
    mu, mu_tend, msftx, msfty,
    rdx, rdy, dts, epssm,
    dnw, fnm, fnp, rdnw,
    window, offsets=(0, 0),
    k0: int, k1: int, kde: int,
    n_inner: int = 2,
    wind_step0=0.0, wind_scale_step=0.0,
    fast: bool = False,
    tj: int | None = None,
    vmem_limit: int | None = None,
    interpret: bool = False,
):
    """``n_inner`` lean/lite scan substeps fused into one Pallas pass.

    Array contract matches ``advance_mu_t_pallas`` (3-D ``(J, K, I)``,
    2-D ``(J, I)``, first/last j rows are ring rows) restricted to the
    scan-substep configuration: lean constants precomputed
    (``lean_constants``), lite ww carry, no t_ave.  Returns
    ``{"t", "mu", "ww_row"}`` — exactly the state the surrounding scan
    carries; the mid-scan-discarded 2-D diagnostics (muave/muts/mudf) are
    not computed (they are re-derived by the FINAL single-step call).

    The wind scale for inner step ``s`` is ``1 + (wind_step0 + s) *
    wind_scale_step`` (both may be traced scalars) — the identical f32
    association as the surrounding loop's per-substep ``wscale_at(n)``
    with ``n = wind_step0 + s``, so the ramp is bit-compatible with
    sequential single-step calls at any block index.

    ``fast`` switches to re-associated f32 arithmetic — NOT
    bit-compatible with the sequential path, held to the same fp32
    tolerances as the XLA tier's documented re-associations.  Because
    the prescribed-wind substep is affine in ``(1, s, ws)``, fast mode
    hoists the masked ww cumsum out of the substep loop (one log-depth
    cumsum each for the constant and wind-proportional parts, once per
    pass), collapses every substep's theta increment to
    ``G0 + s*G1 + ws*G2`` with the ``G*`` precomputed, and then sums
    the S affine increments in closed form (``S*G0 + S(S-1)/2*G1 +
    sum(ws)*G2`` — increments never depend on the carried state, so the
    substep loop disappears entirely).  Per-pass cost is the operand
    streams plus the hoisted precompute; per-substep cost divides by S.
    """
    del epssm, kde  # unused by the scan substep; kept for API parity
    J, K, I = jnp.shape(t)
    if tj is None:
        tj = _pick_tj(K, I, streams=56)
    padj = (-(J - 2)) % tj

    has_wscale = not (
        isinstance(wind_scale_step, (int, float)) and wind_scale_step == 0.0
    )

    const_ok = {"u", "v", "t_1", "tconst", "dvdxi_const"}

    def _ingest3(name, a):
        a = jnp.asarray(a)
        if a.dtype == jnp.bfloat16:
            if name not in const_ok:
                raise ValueError(f"bf16 {name!r} is not a constant stream")
            return a
        return a.astype(F)

    names3 = ["u", "v", "t", "t_1", "tconst", "dvdxi_const"]
    f3 = [_ingest3(n, a) for n, a in
          zip(names3, (u, v, t, t_1, tconst, dvdxi_const))]
    f2 = [jnp.asarray(a, F)[:, None, :]
          for a in (ww_row, ww1_k0, mu, mu_tend, msftx, msfty)]
    if padj:
        f3 = [jnp.pad(a, ((0, padj), (0, 0), (0, 0))) for a in f3]
        f2 = [jnp.pad(a, ((0, padj), (0, 0), (0, 0))) for a in f2]
    Jp = J + padj
    d3 = dict(zip(names3, f3))
    kvecs = [jnp.asarray(a, F)[None, :] for a in (dnw, fnm, fnp, rdnw)]

    scal = jnp.stack([jnp.asarray(s, F) for s in
                      (rdx, rdy, dts, 0.0, wind_step0, wind_scale_step)
                      ])[None, :]
    i0, i1, j0, j1 = window
    j_off, i_off = offsets
    win = jnp.stack([jnp.asarray(x, jnp.int32)
                     for x in (i0, i1, j0, j1, j_off, i_off)])[None, :]

    c3 = _view(tj, K, I, 0)
    c2 = _view(tj, 1, I, 0)
    r3 = functools.partial(_row_view, tj, K, I)
    sk = pl.BlockSpec((1, K), lambda g: (0, 0), memory_space=pltpu.VMEM)
    ssc = pl.BlockSpec((1, 6), lambda g: (0, 0), memory_space=pltpu.SMEM)
    swin = pl.BlockSpec((1, 6), lambda g: (0, 0), memory_space=pltpu.SMEM)

    in_specs = [ssc, swin]
    in_specs += [c3] * 6                     # u, v, t, t_1, tconst, dvdxi_const
    in_specs += [r3(tj), r3(tj), r3(-1)]     # v_hi, t1_hi, t1_lo
    in_specs += [c2] * 6                     # ww_row, ww1_k0, mu, mu_tend, msftx, msfty
    in_specs += [sk] * 4

    operands = [scal, win, *f3,
                d3["v"], d3["t_1"], d3["t_1"],
                *f2, *kvecs]

    big = jax.ShapeDtypeStruct((Jp, K, I), F)
    thin = jax.ShapeDtypeStruct((Jp, 1, I), F)
    out_specs = [c3, c2, c2]
    out_shape = [big, thin, thin]

    # aliases: t, mu and the seed row are read at center only — the grid
    # pipeline can never observe a written row (see the single-step
    # kernel's aliasing contract)
    idx_t = 2 + names3.index("t")
    idx_wwrow = 2 + 6 + 3
    idx_mu = idx_wwrow + 2
    aliases = {idx_t: 0, idx_mu: 1, idx_wwrow: 2}

    kernel = functools.partial(_kernel, k0=k0, k1=k1, tj=tj,
                               n_inner=n_inner, has_wscale=has_wscale,
                               fast=fast, ablate=ablate_from_env())
    t_o, mu_o, wwrow_o = pl.pallas_call(
        kernel,
        grid=((Jp - 2) // tj,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((tj, K, I), F)],
        input_output_aliases=aliases,
        compiler_params=_compiler_params(vmem_limit),
        interpret=interpret,
    )(*operands)

    return {"t": t_o[:J], "mu": mu_o[:J, 0, :], "ww_row": wwrow_o[:J, 0, :]}


# --------------------------------------------------------------------- #
# Coupled (fuse_uv) two-step blocking: trapezoidal j-tiles
# --------------------------------------------------------------------- #
#
# The coupled substep's wind update feeds mass back into the winds, so —
# unlike the mu_t-only loop above — consecutive substeps DO couple
# spatially: substep s+1's winds at row j read substep s's mu at
# j-1/j/j+1 (through p = cs2*mu), and its mass flux reads v at j+1.
# Temporal blocking therefore takes the classic trapezoid form: each
# tile computes step 1 on rows extended by one on each side (recompute
# overlap with the neighboring tiles — compute is free, the loop is
# HBM-bound), then step 2 on its own rows.  Input views widen to +-2
# j rows (mu) / +-1 (u, v, dvdxi_const), which is why the wrapper runs
# on RING-2 padded arrays; the interior i dimension needs nothing extra
# (full-width lanes, i stencils are in-register rolls, and out-of-window
# lanes pass through by mask exactly like the reference's BC ring).
#
# u/v/mu outputs get FRESH buffers (their backward row views would read
# rows the previous tile just wrote if the outputs were aliased — the
# same race the single-step kernel documents for mu under fuse_uv); the
# never-computed ring rows are patched outside the kernel.  t and the ww
# seed row are center-read-only and stay aliased.
#
# Arithmetic per substep is the single-step fused kernel's (fuse_uv +
# lean + lite) term for term, with the wind coefficients cu/cv and msft2
# precomputed as 2-D constants in the kernel's own association
# (coupled_lean_kwargs).  Results agree with two sequential single-step
# calls to <=2 ulp per substep — not bit-equal: the trapezoid program
# shape moves XLA's FMA-contraction/fusion boundaries (measured on the
# interpreted path; the same class of last-ulp drift every device tier's
# tolerance already covers).


def _coupled2_kernel(*refs, k0: int, k1: int, tj: int, fuse_w: bool,
                     fast_scan: bool = False):
    it = iter(refs)
    scal_ref = next(it)   # (1, 7) f32: rdx, rdy, dts, cs2, epssm, c_w, g_t
    win_ref = next(it)    # (1, 6) i32: i0, i1, j0, j1, j_off, i_off
    u_ref, v_ref, t_ref, t1_ref = next(it), next(it), next(it), next(it)
    tconst_ref, dvdxic_ref = next(it), next(it)
    if fuse_w:
        w_ref, pp_ref = next(it), next(it)   # vertical-acoustics state
    (u_lo_ref, u_hi_ref, v_lo_ref, v_hi_ref, v_hi2_ref,
     t1_lo_ref, t1_hi_ref, dvc_lo_ref, dvc_hi_ref) = (
        next(it), next(it), next(it), next(it), next(it),
        next(it), next(it), next(it), next(it))
    (wwrow_ref, ww1k0_ref, mu_ref, mutend_ref, msftx_ref, msfty_ref,
     cu_ref, cv_ref, msft2_ref) = (
        next(it), next(it), next(it), next(it), next(it), next(it),
        next(it), next(it), next(it))
    (mu_lo2_ref, mu_lo_ref, mu_hi_ref, mu_hi2_ref,
     mutend_lo_ref, mutend_hi_ref, msft2_lo_ref, msft2_hi_ref,
     cu_lo_ref, cu_hi_ref, cv_lo_ref, cv_hi_ref, cv_hi2_ref) = (
        next(it), next(it), next(it), next(it), next(it), next(it),
        next(it), next(it), next(it), next(it), next(it), next(it),
        next(it))
    dnw_ref, fnm_ref, fnp_ref, rdnw_ref = next(it), next(it), next(it), next(it)
    if fuse_w:
        aw_ref, cpv_ref, denv_ref = next(it), next(it), next(it)
        crdn_ref, erdn_ref = next(it), next(it)
        if fast_scan:
            fws_ref, fwp_ref, bws_ref, bwp_ref = (
                next(it), next(it), next(it), next(it))
        else:
            fws_ref = fwp_ref = bws_ref = bwp_ref = None
    t_out, u_out, v_out, mu_out, wwrow_out = (
        next(it), next(it), next(it), next(it), next(it))
    if fuse_w:
        w_out, pp_out = next(it), next(it)
    scan_ref = next(it)
    if fuse_w:
        dpw_ref = next(it)   # Thomas sweep state

    rdx, rdy = scal_ref[0, 0], scal_ref[0, 1]
    dts, cs2 = scal_ref[0, 2], scal_ref[0, 3]
    K = t1_ref.shape[1]
    I = t1_ref.shape[2]
    g = pl.program_id(0)

    def roll_i(x, shift):
        return pltpu.roll(x, shift % I, 2)

    def roll_k(x, shift):
        return pltpu.roll(x, shift % K, 1)

    def _ld(ref):
        return ref[:].astype(F)

    def cat(*parts):
        return jnp.concatenate(parts, axis=0)

    # ---- extended assemblies: row index = tile-local e + offset -------
    u0 = cat(u_lo_ref[:], u_ref[:], u_hi_ref[:])                 # e -1..tj
    v0 = cat(v_lo_ref[:], v_ref[:], v_hi_ref[:], v_hi2_ref[:])   # e -1..tj+1
    t1e = cat(_ld(t1_lo_ref), _ld(t1_ref), _ld(t1_hi_ref))       # e -1..tj
    dvc = cat(_ld(dvc_lo_ref), _ld(dvdxic_ref), _ld(dvc_hi_ref))  # e -1..tj
    mu0 = cat(mu_lo2_ref[:], mu_lo_ref[:], mu_ref[:],
              mu_hi_ref[:], mu_hi2_ref[:])                       # e -2..tj+1
    mute = cat(mutend_lo_ref[:], mutend_ref[:], mutend_hi_ref[:])
    msft2e = cat(msft2_lo_ref[:], msft2_ref[:], msft2_hi_ref[:])
    cue = cat(cu_lo_ref[:], cu_ref[:], cu_hi_ref[:])             # e -1..tj
    cve = cat(cv_lo_ref[:], cv_ref[:], cv_hi_ref[:], cv_hi2_ref[:])

    tcon = _ld(tconst_ref)
    t_c = t_ref[:]
    seed = wwrow_ref[:]
    ww1k0 = ww1k0_ref[:]
    msftx = msftx_ref[:]
    msfty = msfty_ref[:]
    inv_msfty = F(1.0) / msfty
    dnw = dnw_ref[:].reshape(1, K, 1)
    fnm = fnm_ref[:].reshape(1, K, 1)
    fnp = fnp_ref[:].reshape(1, K, 1)
    rdnw3 = rdnw_ref[:].reshape(1, K, 1)
    kmask_upd = _k_range_mask(K, k0, k1 + 1)
    kmask_w = _k_range_mask(K, k0 + 1, k1 + 1)

    # ---- masks on the extended (tj+4) row range -----------------------
    i_glob = jax.lax.broadcasted_iota(jnp.int32, (tj + 4, 1, I), 2) \
        + win_ref[0, 5]
    j_glob = (jax.lax.broadcasted_iota(jnp.int32, (tj + 4, 1, I), 0)
              + win_ref[0, 4] + g * tj - 1)           # row m -> e = m-2
    i0w, i1w = win_ref[0, 0], win_ref[0, 1]
    j0w, j1w = win_ref[0, 2], win_ref[0, 3]
    i_in = (i_glob >= i0w) & (i_glob <= i1w)
    j_in = (j_glob >= j0w) & (j_glob <= j1w)
    mask_e = i_in & j_in
    u_mask_e = (i_glob >= i0w + 1) & (i_glob <= i1w) & j_in
    v_mask_e = i_in & (j_glob >= j0w + 1) & (j_glob <= j1w)
    mask_c = mask_e[2 : tj + 2]
    u_mask_c = u_mask_e[2 : tj + 2]
    sl_c = slice(1, tj + 1)            # center rows of an e:-1..tj array

    # shared constants of phase B (t_1 is constant across substeps)
    t1c = t1e[sl_c]
    t1_jp = t1e[2 : tj + 2]
    t1_jm = t1e[0:tj]
    t1_ip = roll_i(t1c, -1)
    t1_im = roll_i(t1c, 1)
    interp = fnm * t1c + fnp * roll_k(t1c, 1)
    mutend_c = mute[sl_c]
    dvc_c = dvc[sl_c]
    msft2_c = msft2e[sl_c]
    cu_c = cue[sl_c]

    ww_scan, theta = _phase_helpers(
        scan_ref=scan_ref, roll_i=roll_i, roll_k=roll_k,
        kmask_upd=kmask_upd, kmask_w=kmask_w, mask_c=mask_c, tcon=tcon,
        interp=interp, rdnw3=rdnw3, t1c=t1c, t1_jp=t1_jp, t1_jm=t1_jm,
        t1_ip=t1_ip, t1_im=t1_im, msftx=msftx, msfty=msfty, rdx=rdx,
        rdy=rdy, dts=dts, fast_scan=fast_scan, K=K, k0=k0, k1=k1,
        ablate=ablate_from_env())

    if fuse_w:
        w_step = _w_solver(
            scan_ref=scan_ref, dpw_ref=dpw_ref,
            aw_ref=aw_ref, cpv_ref=cpv_ref, denv_ref=denv_ref,
            crdn_ref=crdn_ref, erdn_ref=erdn_ref, roll_k=roll_k,
            kmask_upd=kmask_upd, kmask_w=kmask_w, mask_c=mask_c,
            rdnw3=rdnw3, K=K, k0=k0, k1=k1, epssm=scal_ref[0, 4],
            c_w=scal_ref[0, 5], g_t=scal_ref[0, 6],
            fast_solve=fast_scan, fws_ref=fws_ref, fwp_ref=fwp_ref,
            bws_ref=bws_ref, bwp_ref=bwp_ref,
            ablate=ablate_from_env())
        w_st = w_ref[:]
        pp_st = pp_ref[:]

    # ================== step 1 (extended rows) =========================
    p0 = cs2 * mu0                                            # e -2..tj+1
    u1 = u0 + jnp.where(
        u_mask_e[1 : tj + 3],
        cue * (p0[1 : tj + 3] - roll_i(p0[1 : tj + 3], 1)), F(0.0))
    v1 = v0 + jnp.where(
        v_mask_e[1 : tj + 4],
        cve * (p0[1 : tj + 4] - p0[0 : tj + 3]), F(0.0))      # e -1..tj+1
    dvdxi1 = dvc + msft2e * (
        rdy * (v1[1 : tj + 3] - v1[0 : tj + 2])
        + rdx * (roll_i(u1, -1) - u1))                        # e -1..tj
    dmdt1 = jnp.sum(jnp.where(kmask_upd, dnw * dvdxi1, F(0.0)),
                    axis=1, keepdims=True)
    mu1 = jnp.where(mask_e[1 : tj + 3],
                    mu0[1 : tj + 3] + dts * (dmdt1 + mute),
                    mu0[1 : tj + 3])                          # e -1..tj

    steps1 = (-dnw * (dmdt1[sl_c] + dvdxi1[sl_c] + mutend_c)) * inv_msfty
    ww1v = ww_scan(steps1, seed)
    seed = jnp.where(mask_c, seed - ww1k0, seed)
    u1c = u1[sl_c]
    t1new = theta(t_c, u1c, v1[1 : tj + 1], v1[2 : tj + 2], ww1v)
    if fuse_w:
        w_st, pp_st = w_step(w_st, pp_st, t1new)

    # ================== step 2 (center rows) ===========================
    p1 = cs2 * mu1                                            # e -1..tj
    u2 = u1c + jnp.where(
        u_mask_c, cu_c * (p1[sl_c] - roll_i(p1[sl_c], 1)), F(0.0))
    v2 = v1[1 : tj + 2] + jnp.where(
        v_mask_e[2 : tj + 3],
        cve[1 : tj + 2] * (p1[1 : tj + 2] - p1[0 : tj + 1]), F(0.0))
    dvdxi2 = dvc_c + msft2_c * (
        rdy * (v2[1 : tj + 1] - v2[0:tj])
        + rdx * (roll_i(u2, -1) - u2))
    dmdt2 = jnp.sum(jnp.where(kmask_upd, dnw * dvdxi2, F(0.0)),
                    axis=1, keepdims=True)
    mu2 = jnp.where(mask_c, mu1[sl_c] + dts * (dmdt2 + mutend_c),
                    mu1[sl_c])

    steps2 = (-dnw * (dmdt2 + dvdxi2 + mutend_c)) * inv_msfty
    ww2v = ww_scan(steps2, seed)
    seed = jnp.where(mask_c, seed - ww1k0, seed)
    t2 = theta(t1new, u2, v2[0:tj], v2[1 : tj + 1], ww2v)
    if fuse_w:
        w_st, pp_st = w_step(w_st, pp_st, t2)

    t_out[:] = t2
    u_out[:] = u2
    v_out[:] = v2[0:tj]
    mu_out[:] = mu2
    wwrow_out[:] = seed
    if fuse_w:
        w_out[:] = w_st
        pp_out[:] = pp_st


def coupled_lean_kwargs(padded: dict, rdx, rdy, dts) -> dict:
    """Precomputed 2-D wind/flux coefficients for the blocked coupled
    kernel, in the single-step fused kernel's own association:
    ``cu = dts * (muu/msfuy) * (-rdx)``, ``cv = dts * (muv*msfvx_inv) *
    (-rdy)``, ``msft2 = msftx*msfty`` (advance_mu_t_pallas._kernel's
    du/dv/msft2 terms — products only, so precomputing them outside the
    kernel is bit-exact)."""
    rdx = jnp.asarray(rdx, F)
    rdy = jnp.asarray(rdy, F)
    dts = jnp.asarray(dts, F)
    muu = jnp.asarray(padded["muu"], F)
    muv = jnp.asarray(padded["muv"], F)
    return {
        "cu": dts * (muu / jnp.asarray(padded["msfuy"], F)) * (-rdx),
        "cv": dts * (muv * jnp.asarray(padded["msfvx_inv"], F)) * (-rdy),
        "msft2": jnp.asarray(padded["msftx"], F)
        * jnp.asarray(padded["msfty"], F),
    }


def coupled_two_step_pallas(
    *,
    u, v, t, t_1, tconst, dvdxi_const, ww1_k0, ww_row,
    mu, mu_tend, msftx, msfty, cu, cv, msft2,
    rdx, rdy, dts, cs2,
    dnw, fnm, fnp, rdnw,
    window, offsets=(0, 0),
    k0: int, k1: int, kde: int,
    fuse_w: bool = False,            # run the implicit w/pp substep too
    w=None, pp=None, rdn=None,       # vertical-acoustics state (fuse_w)
    cw: float = 0.0, gw: float = 0.0, epssm=0.0,
    fast: bool = False,              # log-depth ww cumsum (re-associated)
    tj: int | None = None,
    vmem_limit: int | None = None,
    interpret: bool = False,
):
    """TWO coupled (advance_uv + advance_mu_t) substeps in one Pallas
    pass over RING-2 arrays.

    Array contract: 3-D ``(J2, K, I)`` / 2-D ``(J2, I)`` where the first
    TWO and last TWO j rows are ring/pad rows (outermost may be zeros —
    they are only read at window-masked positions); ``offsets`` maps
    local row 2 to global ring row ``j_off + 1`` exactly like the ring-1
    kernels map local row 1.  ``(J2 - 4)`` must be a multiple of ``tj``
    (the surrounding loop pads once, outside its scan).  Returns
    ``{"t", "mu", "ww_row", "u", "v"}`` with u/v/mu in FRESH buffers
    whose four ring rows are patched from the inputs.
    """
    del kde
    J2, K, I = jnp.shape(t)
    if tj is None:
        tj = _pick_tj(K, I, streams=64)
    # default tj BEFORE this guard: checking modulo (tj or 1) would let
    # a picked tile silently truncate the grid (unwritten output rows)
    if (J2 - 4) % tj:
        raise ValueError(f"(J2-4)={J2-4} not a multiple of tj={tj}")

    const_ok = {"t_1", "tconst", "dvdxi_const"}

    def _ingest3(name, a):
        a = jnp.asarray(a)
        if a.dtype == jnp.bfloat16:
            if name not in const_ok:
                raise ValueError(f"bf16 {name!r} is not a constant stream")
            return a
        return a.astype(F)

    names3 = ["u", "v", "t", "t_1", "tconst", "dvdxi_const"]
    f3 = [_ingest3(n, a) for n, a in
          zip(names3, (u, v, t, t_1, tconst, dvdxi_const))]
    d3 = dict(zip(names3, f3))
    f2names = ["ww_row", "ww1_k0", "mu", "mu_tend", "msftx", "msfty",
               "cu", "cv", "msft2"]
    f2 = {n: jnp.asarray(a, F)[:, None, :] for n, a in
          zip(f2names, (ww_row, ww1_k0, mu, mu_tend, msftx, msfty,
                        cu, cv, msft2))}
    kvecs = [jnp.asarray(a, F)[None, :] for a in (dnw, fnm, fnp, rdnw)]

    if fuse_w:
        if w is None or pp is None or rdn is None:
            raise ValueError("fuse_w requires w, pp and rdn")
        w3a = jnp.asarray(w, F)
        pp3a = jnp.asarray(pp, F)
        (c_w, g_t, a_vec, b_vec, diag_vec, crdn_vec,
         erdn_vec) = _thomas_coeffs(rdn, rdnw, dts, epssm, cw, gw,
                                    K, k0, k1)
        cp_vec, den_vec = _thomas_hoisted(a_vec, b_vec, diag_vec)
        if fast:
            fastw = _thomas_fast_vectors(a_vec, cp_vec, den_vec, K, k0, k1)
    else:
        c_w = g_t = 0.0

    scal = jnp.stack([jnp.asarray(s, F)
                      for s in (rdx, rdy, dts, cs2, epssm, c_w, g_t)
                      ])[None, :]
    i0, i1, j0, j1 = window
    j_off, i_off = offsets
    win = jnp.stack([jnp.asarray(x, jnp.int32)
                     for x in (i0, i1, j0, j1, j_off, i_off)])[None, :]

    # ring-2 views: center base row = 2 + g*tj  (shift is relative to the
    # ring-1 helpers' base 1 + g*tj)
    c3 = _view(tj, K, I, 1)
    c2 = _view(tj, 1, I, 1)
    r3 = functools.partial(_row_view, tj, K, I)
    r2 = functools.partial(_row_view, tj, 1, I)
    sk = pl.BlockSpec((1, K), lambda g: (0, 0), memory_space=pltpu.VMEM)
    smk = pl.BlockSpec((1, K), lambda g: (0, 0), memory_space=pltpu.SMEM)
    ssc = pl.BlockSpec((1, 7), lambda g: (0, 0), memory_space=pltpu.SMEM)
    swin = pl.BlockSpec((1, 6), lambda g: (0, 0), memory_space=pltpu.SMEM)
    LO2, LO, HI, HI2 = -1, 0, tj + 1, tj + 2   # ring-1-relative shifts

    nw = 2 if fuse_w else 0
    in_specs = [ssc, swin]
    in_specs += [c3] * 6
    if fuse_w:
        in_specs += [c3, c3]                          # w, pp
    in_specs += [r3(LO), r3(HI), r3(LO), r3(HI), r3(HI2),
                 r3(LO), r3(HI), r3(LO), r3(HI)]
    in_specs += [c2] * 9
    in_specs += [r2(LO2), r2(LO), r2(HI), r2(HI2),
                 r2(LO), r2(HI), r2(LO), r2(HI),
                 r2(LO), r2(HI), r2(LO), r2(HI), r2(HI2)]
    in_specs += [sk] * 4
    if fuse_w:
        in_specs += [smk, smk, smk, sk, sk]     # a, c', den, crdn, erdn
        if fast:
            in_specs += [sk] * 4                # fws, fwp, bws, bwp

    operands = [scal, win, *f3]
    if fuse_w:
        operands += [w3a, pp3a]
    operands += [d3["u"], d3["u"], d3["v"], d3["v"], d3["v"],
                 d3["t_1"], d3["t_1"], d3["dvdxi_const"], d3["dvdxi_const"]]
    operands += [f2[n] for n in f2names]
    operands += [f2["mu"], f2["mu"], f2["mu"], f2["mu"],
                 f2["mu_tend"], f2["mu_tend"], f2["msft2"], f2["msft2"],
                 f2["cu"], f2["cu"], f2["cv"], f2["cv"], f2["cv"]]
    operands += kvecs
    if fuse_w:
        operands += [a_vec[None, :], cp_vec[None, :], den_vec[None, :],
                     crdn_vec[None, :], erdn_vec[None, :]]
        if fast:
            operands += [v[None, :] for v in fastw]

    big = jax.ShapeDtypeStruct((J2, K, I), F)
    thin = jax.ShapeDtypeStruct((J2, 1, I), F)
    out_specs = [c3, c3, c3, c2, c2]
    out_shape = [big, big, big, thin, thin]
    if fuse_w:
        out_specs += [c3, c3]
        out_shape += [big, big]
    # t, w, pp and the seed row are center-read-only -> aliased; u/v/mu
    # have backward row views (see the module comment) -> fresh buffers
    idx_t = 2 + names3.index("t")
    idx_wwrow = 2 + 6 + nw + 9
    aliases = {idx_t: 0, idx_wwrow: 4}
    if fuse_w:
        aliases[2 + 6] = 5       # w
        aliases[2 + 6 + 1] = 6   # pp

    kernel = functools.partial(_coupled2_kernel, k0=k0, k1=k1, tj=tj,
                               fuse_w=fuse_w, fast_scan=fast)
    outs = pl.pallas_call(
        kernel,
        grid=((J2 - 4) // tj,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((tj, K, I), F)] * (2 if fuse_w else 1),
        input_output_aliases=aliases,
        compiler_params=_compiler_params(vmem_limit),
        interpret=interpret,
    )(*operands)
    t_o, u_o, v_o, mu_o, wwrow_o = outs[:5]

    def patch(out, inp):
        out = out.at[0:2].set(inp[0:2])
        return out.at[J2 - 2 : J2].set(inp[J2 - 2 : J2])

    res = {
        "t": t_o,
        "u": patch(u_o, d3["u"]),
        "v": patch(v_o, d3["v"]),
        "mu": patch(mu_o[:, 0, :], jnp.asarray(mu, F)),
        "ww_row": wwrow_o[:, 0, :],
    }
    if fuse_w:
        res["w"], res["pp"] = outs[5], outs[6]
    return res


# ------------------------------------------------------------------ #
# Depth-S coupled trapezoid: S substeps per pass over ring-S arrays.
#
# Generalizes the two-step kernel above.  The dependency analysis
# (module comment there) extends: each substep consumes one ring cell
# per side — at substep s (0-based) the wind/mass updates run on rows
# extended by S-1-s per side, the theta/ww/w updates on center rows
# only (their stencils read the CONSTANT t_1 neighbors).  Required
# input extents, in interior-row units relative to the tile:
#
#   mu: +-S,  u: +-(S-1),  v: [-(S-1), +S] (j-staggered),  cu/dvdxi_
#   const/msft2/mu_tend: +-(S-1),  cv: like v,  t_1: +-1 (theta),
#   t/tconst/ww seed/w/pp: center.
#
# Unlike the hand-unrolled S=2 kernel's per-row boundary refs, each
# extended field is ONE pl.Element-window operand (rows tj+2(S-1) etc.)
# — the overlap re-streams 2(S-1) rows of u/v/mu/dvdxi_const per tile,
# the trapezoid's bandwidth cost, which the S in the denominator
# amortizes: per-substep traffic ~ (6 + 6(S-1)/tj)/S + 3/S big fields.
# Recompute on the extended rows is free (the loop is HBM-bound).
#
# Numerics: same class as the S=2 trapezoid — each substep's terms in
# the single-step kernel's association, <=2 ulp/substep drift from XLA
# fusion-boundary moves, NOT bit-equal to sequential substeps.
# Reference parity: module_small_step_em.f90:140-248 (advance_mu_t) +
# the advance_uv wind update it couples to (SURVEY.md §3.4).
# ------------------------------------------------------------------ #
def lane_ring_pad(x, ti: int):
    """Embed ``x`` (lane dim last) into the LANE_RING layout the 2-D
    tiled kernel requires: lanes ``[LANE_RING-1 zeros | x | zeros]`` with
    the tiled center region covering original lanes ``1 .. ni_t`` where
    ``ni_t = ceil((I2-1)/ti)*ti`` (so the original hi ring lane is inside
    the last tile's center, passing through by mask) and total width
    ``2*LANE_RING + ni_t``.  Zero pad lanes are outside every window
    mask.  Call ONCE outside the scan; strip with lane_ring_strip."""
    I2 = x.shape[-1]
    ni_t = -(-(I2 - 1) // ti) * ti
    pad = [(0, 0)] * (x.ndim - 1) + [(LANE_RING - 1,
                                      ni_t + LANE_RING + 1 - I2)]
    return jnp.pad(x, pad)


def lane_ring_strip(x, I2: int):
    """Inverse of lane_ring_pad: original lanes [LANE_RING-1, +I2)."""
    return x[..., LANE_RING - 1 : LANE_RING - 1 + I2]


#: lane ring width of the 2-D (j, i)-tiled layout.  Mosaic requires lane
#: block sizes AND lane window offsets to be multiples of 128 (probe
#: finding 2026-08-20, tools/probe_2d.py), so the minimum lane halo a
#: windowed tile can carry is one 128-lane ring; with the ring exactly
#: 128 the center windows land 128-aligned for free.
LANE_RING = 128


def _deep_unroll(ti, fuse_w: bool = False) -> bool:
    """Static-unrolled sequential sweeps are the deep coupled kernel's
    DEFAULT for the plain (mu/t-only theta/ww) trapezoid — chip A/B:
    CONUS S=4 4.078 -> 4.006, 512^2 S=4 0.576 -> 0.555 ms/substep —
    but NOT for fuse_w, whose unrolled Thomas sweeps measured SLOWER
    (1.089 vs 1.059, same-day A/B 2026-08-20); and MANDATORY under lane
    tiling (pl.ds faults with the 2-D windowed grid).
    WRF_TPU_DEEP_UNROLL=0/1 overrides for A/B — except under lane
    tiling, where fori cannot run."""
    if ti is not None:
        return True
    env = os.environ.get("WRF_TPU_DEEP_UNROLL")
    if env is not None:
        return env != "0"
    return not fuse_w


def _coupled_ms_kernel(*refs, k0: int, k1: int, tj: int, n_inner: int,
                       fuse_w: bool, fast_scan: bool = False,
                       ti: int | None = None, overlap: bool = False,
                       overlap_axis: str = "j",
                       overlap_interpret: bool = False,
                       carry_alias: bool = False):
    S = n_inner
    it = iter(refs)
    scal_ref = next(it)   # (1, 7) f32: rdx, rdy, dts, cs2, epssm, c_w, g_t
    win_ref = next(it)    # (1, 6) i32: i0, i1, j0, j1, j_off, i_off
    u_ref, v_ref, t_ref, t1_ref = next(it), next(it), next(it), next(it)
    tconst_ref, dvdxic_ref = next(it), next(it)
    if fuse_w:
        w_ref, pp_ref = next(it), next(it)
    (wwrow_ref, ww1k0_ref, mu_ref, mutend_ref, msftx_ref, msfty_ref,
     cu_ref, cv_ref, msft2_ref) = (
        next(it), next(it), next(it), next(it), next(it), next(it),
        next(it), next(it), next(it))
    dnw_ref, fnm_ref, fnp_ref, rdnw_ref = next(it), next(it), next(it), next(it)
    if fuse_w:
        aw_ref, cpv_ref, denv_ref = next(it), next(it), next(it)
        crdn_ref, erdn_ref = next(it), next(it)
        if fast_scan:
            fws_ref, fwp_ref, bws_ref, bwp_ref = (
                next(it), next(it), next(it), next(it))
        else:
            fws_ref = fwp_ref = bws_ref = bwp_ref = None
    if overlap:
        # pre-staged width-S ring-exchange payloads (ANY space,
        # lane-padded): my last-S-interior rows of mu/u/v (-> next's lo
        # ring) and my first-S-interior rows (-> prev's hi ring) — the
        # exact rows halo.refresh_axis_w ships, so the landed values are
        # BIT-equal to the exchange-then-compute block refresh
        (sMuN_ref, sMuP_ref, sUN_ref, sUP_ref,
         sVN_ref, sVP_ref) = (next(it), next(it), next(it), next(it),
                              next(it), next(it))
    t_out, u_out, v_out, mu_out, wwrow_out = (
        next(it), next(it), next(it), next(it), next(it))
    if fuse_w:
        w_out, pp_out = next(it), next(it)
    scan_ref = next(it)
    if fuse_w:
        dpw_ref = next(it)
    if overlap:
        (rMuLo_ref, rMuHi_ref, rULo_ref, rUHi_ref,
         rVLo_ref, rVHi_ref) = (next(it), next(it), next(it), next(it),
                                next(it), next(it))
        ov_sems = next(it)
    if carry_alias:
        pu_scr, pv_scr, pmu_scr = next(it), next(it), next(it)

    rdx, rdy = scal_ref[0, 0], scal_ref[0, 1]
    dts, cs2 = scal_ref[0, 2], scal_ref[0, 3]
    K = t1_ref.shape[1]
    I = t1_ref.shape[2]
    g = pl.program_id(0)
    if overlap:
        # grid permuted so the two ring-reading edge tiles run LAST —
        # the in-flight width-S RDMAs get the interior tiles' compute
        # time to land (same schedule as the S=1 overlap kernel,
        # advance_mu_t_pallas)
        n_g = pl.num_programs(0)
        tile = jax.lax.rem(g + 1, n_g)
        is_lo_edge = tile == 0
        is_hi_edge = tile == n_g - 1
    else:
        tile = g

    def roll_i(x, shift):
        return pltpu.roll(x, shift % I, 2)

    def roll_k(x, shift):
        return pltpu.roll(x, shift % K, 1)

    def _ld(ref):
        return ref[:].astype(F)

    # extent-tracked slicing: ``a`` covers rows e in [-a_lo, tj + a_hi);
    # slice it down to [-lo, tj + hi)
    def sl(a, a_lo, lo, hi):
        return a[a_lo - lo : a_lo + tj + hi]

    if overlap:
        from ..parallel.halo import _ring_ids

        nxt, prv, id_type = _ring_ids(overlap_axis, overlap_interpret)
        _xfers = ((sMuN_ref, rMuLo_ref, 0, nxt),
                  (sMuP_ref, rMuHi_ref, 2, prv),
                  (sUN_ref, rULo_ref, 4, nxt),
                  (sUP_ref, rUHi_ref, 6, prv),
                  (sVN_ref, rVLo_ref, 8, nxt),
                  (sVP_ref, rVHi_ref, 10, prv))

        def _rdma(n):
            src, dst, sm, to = _xfers[n]
            return pltpu.make_async_remote_copy(
                src_ref=src, dst_ref=dst,
                send_sem=ov_sems.at[sm], recv_sem=ov_sems.at[sm + 1],
                device_id=to, device_id_type=id_type)

        @pl.when(g == 0)
        def _():
            if not overlap_interpret:
                barrier = pltpu.get_barrier_semaphore()
                pltpu.semaphore_signal(barrier, inc=1, device_id=nxt,
                                       device_id_type=id_type)
                pltpu.semaphore_signal(barrier, inc=1, device_id=prv,
                                       device_id_type=id_type)
                pltpu.semaphore_wait(barrier, 2)
            for n in range(6):
                _rdma(n).start()

        @pl.when(is_lo_edge)
        def _():
            _rdma(0).wait()
            _rdma(2).wait()
            _rdma(4).wait()

        @pl.when(is_hi_edge)
        def _():
            _rdma(1).wait()
            _rdma(3).wait()
            _rdma(5).wait()

    # ---- masks on the full +-S row range ------------------------------
    # Lane-tiled form (ti): each program's block carries ti center lanes
    # plus the LANE_RING halo each side (I = ti + 2*LANE_RING here); the
    # i±1 stencils stay full-block rolls — the roll wrap contaminates
    # only the outermost lane each substep, reaching <= S < LANE_RING
    # lanes in from the block edge, and the outputs take center lanes
    # only, so the wrap garbage never escapes (the 2-D trapezoid in
    # lanes needs no extent slicing).  ``i_glob`` adds the tile's lane
    # offset; win_ref[0, 5] is pre-shifted by the wrapper so lane 0 of
    # tile gi sits at global ring coordinate i_off + gi*ti - (LANE_RING
    # - 1).
    lane_off = pl.program_id(1) * ti if ti is not None else 0
    rows = tj + 2 * S
    i_glob = (jax.lax.broadcasted_iota(jnp.int32, (rows, 1, I), 2)
              + win_ref[0, 5] + lane_off)
    j_glob = (jax.lax.broadcasted_iota(jnp.int32, (rows, 1, I), 0)
              + win_ref[0, 4] + 1 - S + tile * tj)     # row m -> e = m-S
    i0w, i1w = win_ref[0, 0], win_ref[0, 1]
    j0w, j1w = win_ref[0, 2], win_ref[0, 3]
    i_in = (i_glob >= i0w) & (i_glob <= i1w)
    j_in = (j_glob >= j0w) & (j_glob <= j1w)
    mask_f = i_in & j_in
    u_mask_f = (i_glob >= i0w + 1) & (i_glob <= i1w) & j_in
    v_mask_f = i_in & (j_glob >= j0w + 1) & (j_glob <= j1w)
    mask_c = sl(mask_f, S, 0, 0)

    # lane-center slicer: halo-wide block -> the tile's ti center lanes
    # (identity in the 1-D full-row form).  Center-only operands (t,
    # tconst, w, pp, ww seed, msftx/msfty) arrive at center width from
    # their exact-ti windows; only the wind/mass trapezoid and the t_1
    # stencils run on wide blocks.
    if ti is not None:
        def lc(x):
            return x[:, :, LANE_RING : LANE_RING + ti]
    else:
        def lc(x):
            return x
    mask_cc = lc(mask_c)

    # ---- once-per-pass center constants (theta/ww) --------------------
    t1e = _ld(t1_ref)                      # +-1
    t1c = t1e[1 : tj + 1]
    t1_jp = t1e[2 : tj + 2]
    t1_jm = t1e[0:tj]
    t1_ip = roll_i(t1c, -1)
    t1_im = roll_i(t1c, 1)
    tcon = _ld(tconst_ref)
    fnm = fnm_ref[:].reshape(1, K, 1)
    fnp = fnp_ref[:].reshape(1, K, 1)
    interp = fnm * t1c + fnp * roll_k(t1c, 1)
    dnw = dnw_ref[:].reshape(1, K, 1)
    rdnw3 = rdnw_ref[:].reshape(1, K, 1)
    kmask_upd = _k_range_mask(K, k0, k1 + 1)
    kmask_w = _k_range_mask(K, k0 + 1, k1 + 1)
    msftx = msftx_ref[:]
    msfty = msfty_ref[:]
    inv_msfty = F(1.0) / msfty
    ww1k0 = ww1k0_ref[:]
    mutend_c = sl(mutend_ref[:], S - 1, 0, 0)

    # ---- extended streams ---------------------------------------------
    mu_src, u_src, v_src = mu_ref[:], u_ref[:], v_ref[:]
    if overlap:
        # edge tiles: the ring rows INSIDE the loaded wide blocks are
        # stale mid-scan — replace them with the landed width-S RDMA
        # rows (outer-dim concat, no relayout).  Offsets: the lo ring
        # holds rows [0..S) but u/v windows start at ring row 1 (their
        # lo extent is S-1); the payload covers the full S rows so the
        # slice offset selects the needed ones.
        def _sub_edges(blk, lo_cnt, hi_cnt, r_lo, r_hi, lo_off):
            if lo_cnt:
                lo_rows = r_lo[lo_off : lo_off + lo_cnt, :, :I]
                blk = jnp.where(
                    is_lo_edge,
                    jnp.concatenate([lo_rows, blk[lo_cnt:]], axis=0), blk)
            if hi_cnt:
                hi_rows = r_hi[0:hi_cnt, :, :I]
                blk = jnp.where(
                    is_hi_edge,
                    jnp.concatenate([blk[: blk.shape[0] - hi_cnt],
                                     hi_rows], axis=0), blk)
            return blk

        mu_src = _sub_edges(mu_src, S, S, rMuLo_ref, rMuHi_ref, 0)
        u_src = _sub_edges(u_src, S - 1, S - 1, rULo_ref, rUHi_ref, 1)
        v_src = _sub_edges(v_src, S - 1, S, rVLo_ref, rVHi_ref, 1)
    if carry_alias:
        # u/v/mu ride input_output_aliases (in-place carried state — no
        # fresh output buffers, no wrapper patch, and no XLA while-body
        # carry copies, which the r05 trace measured at ~0.09
        # ms/substep, tools/coupled_trace.py).  The price of in-place:
        # this program's BACKWARD-extent rows may have been flushed to
        # HBM by the previous program before this window was fetched
        # (the fetch races the write under Mosaic's pipelining), so the
        # fetched values there are indeterminate.  The trapezoid needs
        # the BLOCK-START values, so on the sequential grid every
        # program stashes the rows the NEXT program's backward extent
        # covers — taken from its OWN cleanly-fetched rows strictly
        # above every earlier program's write window (requires
        # tj >= S; the wrapper gates on it) — into VMEM scratch that
        # persists across programs, and every program but the first
        # substitutes its backward rows from the stash.  FORWARD-extent
        # rows are written only by later programs, so their fetched
        # values are always the block-start ones.  Values are exactly
        # the fresh-buffer path's (the substituted rows are the same
        # block-start rows patch() preserved) — bit-equality is gated
        # by the trapezoid-vs-sequential suite.
        guard = g > 0

        def _sub_stale(src, scr, lo):
            front = jnp.where(guard, scr[:], src[:lo])
            return jnp.concatenate([front, src[lo:]], axis=0)

        new_mu = _sub_stale(mu_src, pmu_scr, S)
        new_u = _sub_stale(u_src, pu_scr, S - 1)
        new_v = _sub_stale(v_src, pv_scr, S - 1)
        pmu_scr[:] = mu_src[tj : tj + S]
        pu_scr[:] = u_src[tj : tj + S - 1]
        pv_scr[:] = v_src[tj : tj + S - 1]
        mu_src, u_src, v_src = new_mu, new_u, new_v
    mu_c, mu_lo = mu_src, S
    u_c, u_lo = u_src, S - 1
    v_c, v_lo = v_src, S - 1              # hi extent S (j-staggered)
    mute_e = mutend_ref[:]
    cu_e = cu_ref[:]
    cv_e = cv_ref[:]
    msft2_e = msft2_ref[:]
    dvc_e = _ld(dvdxic_ref)
    t_c = t_ref[:]
    seed = wwrow_ref[:]

    ww_scan, theta = _phase_helpers(
        scan_ref=scan_ref, roll_i=roll_i, roll_k=roll_k,
        kmask_upd=kmask_upd, kmask_w=kmask_w, mask_c=mask_cc, tcon=tcon,
        interp=lc(interp), rdnw3=rdnw3, t1c=t1c, t1_jp=t1_jp,
        t1_jm=t1_jm, t1_ip=t1_ip, t1_im=t1_im, msftx=msftx, msfty=msfty,
        rdx=rdx, rdy=rdy, dts=dts, fast_scan=fast_scan, K=K, k0=k0,
        k1=k1, lc=lc, ablate=ablate_from_env(),
        unroll=_deep_unroll(ti, fuse_w), regscan_ok=True)

    if fuse_w:
        w_step = _w_solver(
            scan_ref=scan_ref, dpw_ref=dpw_ref,
            aw_ref=aw_ref, cpv_ref=cpv_ref, denv_ref=denv_ref,
            crdn_ref=crdn_ref, erdn_ref=erdn_ref, roll_k=roll_k,
            kmask_upd=kmask_upd, kmask_w=kmask_w, mask_c=mask_cc,
            rdnw3=rdnw3, K=K, k0=k0, k1=k1, epssm=scal_ref[0, 4],
            c_w=scal_ref[0, 5], g_t=scal_ref[0, 6],
            fast_solve=fast_scan, fws_ref=fws_ref, fwp_ref=fwp_ref,
            bws_ref=bws_ref, bwp_ref=bwp_ref,
            unroll=_deep_unroll(ti, fuse_w), ablate=ablate_from_env())
        w_st = w_ref[:]
        pp_st = pp_ref[:]

    # ================== S substeps, extents shrinking ==================
    _ablate = ablate_from_env()
    for s in range(S):
        r = S - 1 - s
        if "nowind" in _ablate:
            # perf-debug (WRF_TPU_ABLATE=nowind): delete the wind/mass
            # trapezoid arithmetic but keep every operand stream — with
            # noscan,nophaseb this measures the kernel's pure
            # stream/pipeline floor (outputs NOT physical; see
            # tools/coupled_decomp.py)
            u_n = sl(u_c, u_lo, r, r)
            v_n = sl(v_c, v_lo, r, r + 1)
            dvdxi = sl(dvc_e, S - 1, r, r)
            dmdt = dvdxi[:, :1, :] * F(0.0)
            mu_n = sl(mu_c, mu_lo, r, r)
        else:
            p = cs2 * mu_c                           # extent +-(r+1)
            pm = sl(p, mu_lo, r, r)
            u_n = sl(u_c, u_lo, r, r) + jnp.where(
                sl(u_mask_f, S, r, r),
                sl(cu_e, S - 1, r, r) * (pm - roll_i(pm, 1)), F(0.0))
            v_n = sl(v_c, v_lo, r, r + 1) + jnp.where(
                sl(v_mask_f, S, r, r + 1),
                sl(cv_e, S - 1, r, r + 1)
                * (sl(p, mu_lo, r, r + 1) - sl(p, mu_lo, r + 1, r)),
                F(0.0))
            dvdxi = sl(dvc_e, S - 1, r, r) + sl(msft2_e, S - 1, r, r) * (
                rdy * (v_n[1:] - v_n[:-1]) + rdx * (roll_i(u_n, -1) - u_n))
            dmdt = jnp.sum(jnp.where(kmask_upd, dnw * dvdxi, F(0.0)),
                           axis=1, keepdims=True)
            mu_n = jnp.where(
                sl(mask_f, S, r, r),
                sl(mu_c, mu_lo, r, r)
                + dts * (dmdt + sl(mute_e, S - 1, r, r)),
                sl(mu_c, mu_lo, r, r))

        steps_c = (-dnw * lc(sl(dmdt, r, 0, 0) + sl(dvdxi, r, 0, 0)
                             + mutend_c)) * inv_msfty
        wwv = ww_scan(steps_c, seed)
        seed = jnp.where(mask_cc, seed - ww1k0, seed)
        t_c = theta(t_c, sl(u_n, r, 0, 0), sl(v_n, r, 0, 0),
                    v_n[r + 1 : r + tj + 1], wwv)
        if fuse_w:
            w_st, pp_st = w_step(w_st, pp_st, t_c)

        mu_c, mu_lo = mu_n, r
        u_c, u_lo = u_n, r
        v_c, v_lo = v_n, r

    # lane-tiled: t/w/pp/seed computed center-width; u/v/mu wide -> lc
    t_out[:] = t_c
    u_out[:] = lc(u_c)
    v_out[:] = lc(v_c[0:tj])
    mu_out[:] = lc(mu_c)
    wwrow_out[:] = seed
    if fuse_w:
        w_out[:] = w_st
        pp_out[:] = pp_st


def coupled_multistep_pallas(
    *,
    u, v, t, t_1, tconst, dvdxi_const, ww1_k0, ww_row,
    mu, mu_tend, msftx, msfty, cu, cv, msft2,
    rdx, rdy, dts, cs2,
    dnw, fnm, fnp, rdnw,
    window, offsets=(0, 0),
    k0: int, k1: int, kde: int,
    n_inner: int = 2,
    fuse_w: bool = False,
    w=None, pp=None, rdn=None,
    cw: float = 0.0, gw: float = 0.0, epssm=0.0,
    fast: bool = False,
    tj: int | None = None,
    ti: int | None = None,
    vmem_limit: int | None = None,
    overlap: dict | None = None,    # in-kernel overlapped width-S ring
                                    # exchange of mu/u/v along j:
                                    # {"axis_name", "n_interior",
                                    #  "collective_id"}
    interpret: bool = False,
):
    """``n_inner`` coupled (advance_uv + advance_mu_t) substeps in one
    Pallas pass over RING-``n_inner`` arrays.

    Generalizes :func:`coupled_two_step_pallas` (same array contract at
    depth S: the first/last S j rows are ring/pad rows; ``offsets`` maps
    local row S to global ring row ``j_off + 1``).  ``(J2 - 2*S)`` must
    be a multiple of ``tj``.  Returns ``{"t", "mu", "ww_row", "u", "v"}``
    (+ ``w``/``pp`` under ``fuse_w``) with u/v/mu in FRESH buffers whose
    ring rows are patched from the inputs.

    ``ti`` switches to the 2-D (j, i)-tiled grid: the arrays must then
    be in the LANE-RING layout — lanes ``[LANE_RING-1 zero pad |
    original lanes | zero pad]`` with total width a multiple of 128 and
    ``(I - 2*LANE_RING) % ti == 0`` — built ONCE by the caller outside
    its scan (``lane_ring_pad``).  Each program owns ``(rows, K, ti)``
    center lanes plus the 128-lane halo each side on the trapezoid
    operands only; center-only operands (t, tconst, w, pp, the ww seed)
    stream at exactly ``ti`` lanes.  VMEM per program then no longer
    scales with the domain width — the design point VERDICT r03 #1
    names — and the kernel lowering cost drops with the lane width,
    which is what makes deep S practical at CONUS width (S=8 lowering
    at 1500 lanes was abandoned at 25+ min, tools/conus_probe.py).
    Not bit-identical to the 1-D form (same <=2 ulp/substep
    fusion-boundary class as every trapezoid vs sequential comparison).
    """
    del kde
    S = int(n_inner)
    if S < 2:
        raise ValueError("n_inner must be >= 2 (use the single-step "
                         "kernel for S=1)")
    J2, K, I = jnp.shape(t)
    if tj is None:
        tj = _pick_tj(K, I, streams=64, fixed_rows=6 * (S - 2))
    if (J2 - 2 * S) % tj:
        raise ValueError(f"(J2-2S)={J2 - 2 * S} not a multiple of tj={tj}")
    if ti is not None:
        if ti % 128:
            raise ValueError(f"ti={ti} must be a multiple of 128 "
                             "(Mosaic lane window alignment)")
        if I % 128 or (I - 2 * LANE_RING) % ti or I < ti + 2 * LANE_RING:
            raise ValueError(
                f"lane-tiled arrays need I % 128 == 0 and "
                f"(I - {2 * LANE_RING}) % ti == 0; got I={I}, ti={ti}")
        if S > LANE_RING:
            raise ValueError("S must be <= LANE_RING")
    if overlap is not None:
        if ti is not None:
            raise ValueError("overlap and lane tiling (ti) are not "
                             "composed yet")
        n_int = int(overlap["n_interior"])
        if (J2 - 2 * S) != n_int or (tj and n_int % tj):
            raise ValueError(
                f"overlap requires zero row padding and tj | n_interior "
                f"(J2-2S={J2 - 2 * S}, n_interior={n_int}, tj={tj})")
        if tj < S:
            raise ValueError(f"overlap requires tj >= S so only the two "
                             f"edge tiles read ring rows (tj={tj}, "
                             f"S={S})")

    # in-place carried state (u/v/mu aliased; kernel-side stash/
    # substitute of the backward-extent rows): the 1-D unpermuted grid
    # only — the overlap mode's permuted grid breaks the sequential-
    # neighbor stash handoff, and the lane-tiled grid revisits j rows
    # per lane tile.  tj >= S keeps every stash row above earlier
    # programs' write windows (see the kernel comment).
    # WRF_TPU_CARRY_ALIAS=0 is the A/B kill-switch (fresh-buffer path).
    carry_alias = (overlap is None and ti is None and tj >= S
                   and os.environ.get("WRF_TPU_CARRY_ALIAS", "1") != "0")

    const_ok = {"t_1", "tconst", "dvdxi_const"}

    def _ingest3(name, a):
        a = jnp.asarray(a)
        if a.dtype == jnp.bfloat16:
            if name not in const_ok:
                raise ValueError(f"bf16 {name!r} is not a constant stream")
            return a
        return a.astype(F)

    names3 = ["u", "v", "t", "t_1", "tconst", "dvdxi_const"]
    f3 = [_ingest3(n, a) for n, a in
          zip(names3, (u, v, t, t_1, tconst, dvdxi_const))]
    d3 = dict(zip(names3, f3))
    f2names = ["ww_row", "ww1_k0", "mu", "mu_tend", "msftx", "msfty",
               "cu", "cv", "msft2"]
    f2 = {n: jnp.asarray(a, F)[:, None, :] for n, a in
          zip(f2names, (ww_row, ww1_k0, mu, mu_tend, msftx, msfty,
                        cu, cv, msft2))}
    kvecs = [jnp.asarray(a, F)[None, :] for a in (dnw, fnm, fnp, rdnw)]

    if fuse_w:
        if w is None or pp is None or rdn is None:
            raise ValueError("fuse_w requires w, pp and rdn")
        w3a = jnp.asarray(w, F)
        pp3a = jnp.asarray(pp, F)
        (c_w, g_t, a_vec, b_vec, diag_vec, crdn_vec,
         erdn_vec) = _thomas_coeffs(rdn, rdnw, dts, epssm, cw, gw,
                                    K, k0, k1)
        cp_vec, den_vec = _thomas_hoisted(a_vec, b_vec, diag_vec)
        if fast:
            fastw = _thomas_fast_vectors(a_vec, cp_vec, den_vec, K, k0, k1)
    else:
        c_w = g_t = 0.0

    scal = jnp.stack([jnp.asarray(s_, F)
                      for s_ in (rdx, rdy, dts, cs2, epssm, c_w, g_t)
                      ])[None, :]
    i0, i1, j0, j1 = window
    j_off, i_off = offsets
    if ti is not None:
        # lane-tiled mapping: in-block lane l of tile gi sits at global
        # ring coordinate i_off + gi*ti + l - (LANE_RING - 1) (original
        # lane 0 lives at array lane LANE_RING - 1)
        i_off = i_off - (LANE_RING - 1)
    win = jnp.stack([jnp.asarray(x, jnp.int32)
                     for x in (i0, i1, j0, j1, j_off, i_off)])[None, :]

    # pl.Element windows: rows [S - lo + g*tj, + nrows).  In lane-tiled
    # mode the windows additionally select lanes: ``wide=True`` carries
    # the tile's ti center lanes plus the 128-lane halo each side (the
    # trapezoid operands), ``wide=False`` exactly the ti center lanes
    # (center-only operands).  Both lane offsets are 128-aligned by the
    # LANE_RING layout, which Mosaic requires.
    if overlap is not None:
        grid_n1 = (J2 - 2 * S) // tj
        _pf = lambda g: jax.lax.rem(g + 1, grid_n1)  # noqa: E731
    else:
        _pf = lambda g: g  # noqa: E731

    if ti is None:
        def ev(nrows, lo, kk, wide=True):
            del wide
            return pl.BlockSpec(
                (pl.Element(nrows), pl.Element(kk), pl.Element(I)),
                lambda g, o=S - lo: (o + _pf(g) * tj, 0, 0),
                memory_space=pltpu.VMEM,
            )

        def _flat(spec_shape):
            return pl.BlockSpec(spec_shape, lambda g: (0, 0),
                                memory_space=pltpu.VMEM)

        def _flat_smem(spec_shape):
            return pl.BlockSpec(spec_shape, lambda g: (0, 0),
                                memory_space=pltpu.SMEM)
    else:
        def ev(nrows, lo, kk, wide=True):
            lanes = ti + 2 * LANE_RING if wide else ti
            lane0 = 0 if wide else LANE_RING
            # pl.multiple_of: Mosaic's window-param prover cannot see
            # that l0 + gi*ti is 128-aligned on its own and hard-crashes
            # the compile helper without the hint (probe_2d_bisect rung
            # c, 2026-08-20)
            return pl.BlockSpec(
                (pl.Element(nrows), pl.Element(kk), pl.Element(lanes)),
                lambda gj, gi, o=S - lo, l0=lane0: (
                    o + gj * tj, 0, pl.multiple_of(l0 + gi * ti, 128)),
                memory_space=pltpu.VMEM,
            )

        def _flat(spec_shape):
            return pl.BlockSpec(spec_shape, lambda gj, gi: (0, 0),
                                memory_space=pltpu.VMEM)

        def _flat_smem(spec_shape):
            return pl.BlockSpec(spec_shape, lambda gj, gi: (0, 0),
                                memory_space=pltpu.SMEM)

    sk = _flat((1, K))
    smk = _flat_smem((1, K))
    ssc = _flat_smem((1, 7))
    swin = _flat_smem((1, 6))

    c3 = ev(tj, 0, K, wide=False)
    c2 = ev(tj, 0, 1, wide=False)
    nw = 2 if fuse_w else 0
    in_specs = [ssc, swin,
                ev(tj + 2 * S - 2, S - 1, K),     # u
                ev(tj + 2 * S - 1, S - 1, K),     # v (hi extent S)
                c3,                                # t (center, aliased)
                ev(tj + 2, 1, K),                  # t_1 (theta stencils)
                c3,                                # tconst
                ev(tj + 2 * S - 2, S - 1, K)]      # dvdxi_const
    if fuse_w:
        in_specs += [c3, c3]                       # w, pp
    in_specs += [c2, c2,                           # ww_row, ww1_k0
                 ev(tj + 2 * S, S, 1),             # mu
                 ev(tj + 2 * S - 2, S - 1, 1),     # mu_tend
                 c2, c2,                           # msftx, msfty
                 ev(tj + 2 * S - 2, S - 1, 1),     # cu
                 ev(tj + 2 * S - 1, S - 1, 1),     # cv
                 ev(tj + 2 * S - 2, S - 1, 1)]     # msft2
    in_specs += [sk] * 4
    if fuse_w:
        in_specs += [smk, smk, smk, sk, sk]
        if fast:
            in_specs += [sk] * 4                # fws, fwp, bws, bwp

    operands = [scal, win, d3["u"], d3["v"], d3["t"], d3["t_1"],
                d3["tconst"], d3["dvdxi_const"]]
    if fuse_w:
        operands += [w3a, pp3a]
    operands += [f2[n] for n in f2names]
    operands += kvecs
    if fuse_w:
        operands += [a_vec[None, :], cp_vec[None, :], den_vec[None, :],
                     crdn_vec[None, :], erdn_vec[None, :]]
        if fast:
            operands += [v_[None, :] for v_ in fastw]

    big = jax.ShapeDtypeStruct((J2, K, I), F)
    thin = jax.ShapeDtypeStruct((J2, 1, I), F)
    out_specs = [c3, c3, c3, c2, c2]
    out_shape = [big, big, big, thin, thin]
    if fuse_w:
        out_specs += [c3, c3]
        out_shape += [big, big]
    # t, w, pp and the seed row are center-read-only -> aliased; u/v/mu
    # have backward extended views — under ``carry_alias`` they alias
    # in place too (the kernel's VMEM stash supplies the block-start
    # values of the racy backward rows, see _coupled_ms_kernel);
    # otherwise fresh buffers (the S=2 kernel's module-comment hazard)
    aliases = {4: 0, 8 + nw: 4}
    if fuse_w:
        aliases[8] = 5
        aliases[9] = 6
    if carry_alias:
        aliases[2] = 1           # u
        aliases[3] = 2           # v
        aliases[10 + nw] = 3     # mu

    if overlap is not None:
        # stage the width-S exchange payloads: the same interior rows
        # halo.refresh_axis_w ships (first/last S interior rows of
        # mu/u/v), lane-padded to 128 for the whole-buffer remote copies
        n_int = int(overlap["n_interior"])
        Ipad = -(-I // 128) * 128

        def _lp(x):
            return jnp.pad(x, ((0, 0), (0, 0), (0, Ipad - I)))

        pay = []
        for arr in (f2["mu"], d3["u"].astype(F), d3["v"].astype(F)):
            pay += [_lp(arr[n_int : n_int + S]),   # last S int -> next lo
                    _lp(arr[S : 2 * S])]           # first S int -> prev hi
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        in_specs += [any_spec] * 6
        operands += pay

    kernel = functools.partial(
        _coupled_ms_kernel, k0=k0, k1=k1, tj=tj,
        n_inner=S, fuse_w=fuse_w, fast_scan=fast, ti=ti,
        overlap=overlap is not None,
        overlap_axis=(overlap or {}).get("axis_name", "j"),
        overlap_interpret=interpret,
        carry_alias=carry_alias)
    if ti is None:
        grid = ((J2 - 2 * S) // tj,)
        scr_lanes = I
    else:
        grid = ((J2 - 2 * S) // tj, (I - 2 * LANE_RING) // ti)
        scr_lanes = ti
    scratch = [pltpu.VMEM((tj, K, scr_lanes), F)] * (2 if fuse_w else 1)
    if overlap is not None:
        scratch += [pltpu.VMEM((S, 1, Ipad), F),   # recv mu lo
                    pltpu.VMEM((S, 1, Ipad), F),   # recv mu hi
                    pltpu.VMEM((S, K, Ipad), F),   # recv u lo
                    pltpu.VMEM((S, K, Ipad), F),   # recv u hi
                    pltpu.VMEM((S, K, Ipad), F),   # recv v lo
                    pltpu.VMEM((S, K, Ipad), F),   # recv v hi
                    pltpu.SemaphoreType.DMA((12,))]
    if carry_alias:
        scratch += [pltpu.VMEM((S - 1, K, I), F),  # stash: u backward
                    pltpu.VMEM((S - 1, K, I), F),  # stash: v backward
                    pltpu.VMEM((S, 1, I), F)]      # stash: mu backward
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        compiler_params=_compiler_params(
            vmem_limit,
            collective_id=(None if overlap is None
                           else overlap.get("collective_id", 8)),
        ),
        interpret=interpret,
    )(*operands)
    t_o, u_o, v_o, mu_o, wwrow_o = outs[:5]

    def patch(out, inp):
        out = out.at[0:S].set(inp[0:S])
        out = out.at[J2 - S : J2].set(inp[J2 - S : J2])
        if ti is not None:
            # fresh lane-tiled buffers: the ring/pad lanes are never
            # covered by an output window — pass them through too
            hi = LANE_RING + (I - 2 * LANE_RING)
            out = out.at[..., 0:LANE_RING].set(inp[..., 0:LANE_RING])
            out = out.at[..., hi:I].set(inp[..., hi:I])
        return out

    if carry_alias:
        # in-place outputs: the unwritten ring/boundary rows retain the
        # input's values in the SAME buffer — patch is structural there
        res = {"t": t_o, "u": u_o, "v": v_o, "mu": mu_o[:, 0, :],
               "ww_row": wwrow_o[:, 0, :]}
    else:
        res = {
            "t": t_o,
            "u": patch(u_o, d3["u"]),
            "v": patch(v_o, d3["v"]),
            "mu": patch(mu_o[:, 0, :], jnp.asarray(mu, F)[:, :]),
            "ww_row": wwrow_o[:, 0, :],
        }
    if fuse_w:
        res["w"], res["pp"] = outs[5], outs[6]
    return res
