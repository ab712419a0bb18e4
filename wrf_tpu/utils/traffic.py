"""HBM traffic accounting for the production loop configurations.

Purpose: make the memory-bound claim machine-checkable round over round.
``bench.py`` divides each config's modeled bytes/substep by its measured
time and reports achieved GB/s plus the fraction of the measured bare-copy
ceiling — when a config sits at ~100% of the ceiling it is HBM-bound and
only traffic removal can speed it up; when it sits well below, it is
compute/pipeline-bound and arithmetic is the lever (the S=8 blocked kernel
ablations in README.md reached the same verdicts by compute ablation).

The model enumerates the Pallas kernels' actual operand streams — counted
from the wrappers' BlockSpecs, not guessed:

* single-step lean/lite scan body (ops/advance_mu_t_pallas.py:782-899):
  six (J,K,I) center reads (u, v, t, t_1, tconst, dvdxi_const), one big
  write (t), ~3 extra boundary rows per j-tile, plus the thin (J,1,I)
  2-D streams;
* fuse_uv adds u/v writes; fuse_w adds w/pp reads AND writes
  (same wrapper, fuse_w branches);
* the temporally-blocked mu_t kernel (ops/advance_mu_t_msteps.py:515-558)
  moves the same 7 big passes once per S substeps;
* the depth-S coupled trapezoid (ops/advance_mu_t_msteps.py:1236-1254)
  re-streams 2(S-1)-row overlap windows of u/v/mu/dvdxi_const per tile —
  the (6S-3)/tj term below, per its own module comment.

bf16 constant streams (const_dtype=bfloat16) halve the width of the
eligible read-only operands (advance_mu_t_pallas._ingest3 const_ok sets).

The reference has no analog (it never reasons about bandwidth); the model
plays the role its ``--ptxas-options=-v`` occupancy dump played — a
machine-readable statement of what the kernel asks of the memory system.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Traffic:
    bytes_per_substep: float
    big_passes: float          # in full (ny,nz,nx)-f32-field units
    detail: str


def _field_bytes(nx: int, ny: int, nz: int) -> float:
    """One full-domain 3-D f32 field pass (local block incl. the 1-cell
    ring the loops actually stream: (ny+2, nz, nx+2))."""
    return float((ny + 2) * nz * (nx + 2) * 4)


def substep_traffic(nx: int, ny: int, nz: int, *, coupled: bool,
                    with_w: bool = False, S: int = 1, tj: int = 8,
                    bf16: bool = False) -> Traffic:
    """Modeled HBM bytes per substep for a production-loop configuration.

    Counts only the scan-body kernel (what the marginal two-count timing
    isolates); the per-invocation prologue/epilogue cancels in the
    difference.  Thin (J,1,I) streams are included at their 1/nz weight.
    """
    big = _field_bytes(nx, ny, nz)
    thin = big / nz
    half = 0.5 if bf16 else 1.0

    if not coupled:
        if with_w:
            raise ValueError("with_w requires the coupled loop")
        # lean/lite mu_t: const reads are bf16-eligible INCLUDING the
        # read-only winds (wind_scale path, _ingest3 const_ok)
        const_reads = 5 * half  # u, v, t_1, tconst, dvdxi_const
        state = 2.0             # t read + t write (always f32)
        rows = 3.0 / tj         # v_hi, t1_hi, t1_lo boundary rows
        # thin: ww_row, ww1_k0, mu, mu_tend, msftx, msfty (+3 more 2-D
        # reads and muave/muts/mudf writes on the single-step kernel;
        # use the blocked kernel's 6r+2w set — the S=1 extras are < 0.3%)
        thin_passes = 8.0
        passes = (const_reads + state + rows) / 1.0  # per pass == per substep at S=1
        if S > 1:
            passes = (const_reads + state + rows) / S
            thin_passes = thin_passes / S
        det = (f"mu_t S={S}: ({const_reads:g} const + 2 t + {rows:.2f} "
               f"rows)/S big passes")
    else:
        # coupled trapezoid (S>=2) or single-step fuse_uv (S=1).
        # bf16-eligible consts: t_1, tconst, dvdxi_const only (u/v are
        # state under fuse_uv).
        const_reads = 3 * half            # t_1, tconst, dvdxi_const
        state = 3.0 + 3.0                 # u, v, t reads + writes (f32)
        overlap = (6.0 * S - 3.0) / tj if S > 1 else 3.0 / tj
        wpp = 4.0 if with_w else 0.0      # w, pp read + write
        thin_passes = (13.0 + (2.0 * S) / tj) / S if S > 1 else 13.0
        passes = (const_reads + state + overlap + wpp) / S
        det = (f"coupled S={S} tj={tj}: ({const_reads:g} const + 6 uvt + "
               f"{overlap:.2f} overlap + {wpp:g} w/pp)/S big passes")

    total = passes * big + thin_passes * thin
    return Traffic(bytes_per_substep=total, big_passes=passes, detail=det)
