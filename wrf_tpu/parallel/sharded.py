"""SPMD advance_mu_t over a 2-D (j, i) device mesh.

TPU-native replacement for the reference's multi-GPU orchestrator
(advance_mu_t_no_async.cu:35-424).  Where the reference synthesizes per-GPU
j-slab bounds on the host and stages 3-row halos through ``cudaMemcpy``, here:

  * global state lives as ``jax.Array`` with ``NamedSharding`` over the mesh
    — the decomposition is 2-D ``(j, i)`` instead of 1-D j-slabs;
  * the step runs under ``jax.shard_map``; the 1-cell halo each stencil
    needs is exchanged chip-to-chip with ``lax.ppermute`` (ICI), never
    through the host;
  * per-shard boundary handling is *mask-based*: every shard runs the same
    program, and the BC-aware window masks (computed from each shard's
    global offset) make only global-edge shards apply the bound shrink —
    this replaces the reference's per-GPU ``jds_g/jts_g/jde_g/jte_g`` bound
    synthesis (advance_mu_t_no_async.cu:108-162);
  * the vertical dimension stays chip-local (column reduction + scan), the
    decomposition the reference also chose (one thread owns a full column).

Arrays here are *ring-shaped*: the staggered domain extents plus a 1-cell
boundary ring, ``(jde+2, kdim, ide+2)``.  The ring carries caller-provided
lateral-boundary data — the same contract as the reference's memory window
(domain + halo padding), which the kernel reads at domain edges whenever the
BC flags do not shrink the window (periodic/open cases).  Arrays are
zero-padded up to mesh-divisible sizes; padding is excluded by the masks.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..grid import ConfigFlags, GridBounds
from ..ops.advance_mu_t_jnp import advance_mu_t_impl
from . import halo
from .mesh import replicated, sharding2, sharding3

F = jnp.float32

#: the ten 3-D and nine 2-D fields of the kernel signature, in argument order
FIELDS_3D = ("ww", "ww_1", "u", "u_1", "v", "v_1", "t", "t_1", "t_ave", "ft")
FIELDS_2D = ("mu", "mut", "muu", "muv", "mu_tend",
             "msfuy", "msfvx_inv", "msftx", "msfty")
FIELDS_1D = ("dnw", "fnm", "fnp", "rdnw")
SCALARS = ("rdx", "rdy", "dts", "epssm")
STATE_KEYS = ("ww", "mu", "t", "t_ave")  # carried between small steps


#: width of the caller-provided global boundary ring carried by sharded state
RING = 1


def domain_window(nx: int, ny: int, nz: int, flags: ConfigFlags):
    """BC-aware compute window in 0-based *ring* coordinates (domain
    coordinates shifted by the RING offset)."""
    i0, i1, j0, j1, k0, k1 = GridBounds.for_domain(nx, ny, nz, halo=0).loop_bounds(flags)
    return (i0 + RING, i1 + RING, j0 + RING, j1 + RING, k0, k1)


def pad_to_mesh(x: np.ndarray | jax.Array, mesh: Mesh) -> jax.Array:
    """Zero-pad the decomposed axes up to multiples of the mesh shape."""
    nj, ni = mesh.shape["j"], mesh.shape["i"]
    if x.ndim == 3:
        pj = (-x.shape[0]) % nj
        pi = (-x.shape[2]) % ni
        return jnp.pad(jnp.asarray(x, F), ((0, pj), (0, 0), (0, pi)))
    if x.ndim == 2:
        pj = (-x.shape[0]) % nj
        pi = (-x.shape[1]) % ni
        return jnp.pad(jnp.asarray(x, F), ((0, pj), (0, pi)))
    return jnp.asarray(x, F)


def _local_masks(window, nj_loc: int, ni_loc: int):
    """Window masks for this shard's halo-padded block, from global offsets."""
    i0, i1, j0, j1, _, _ = window
    j_start = jax.lax.axis_index("j") * nj_loc - 1  # -1: halo row
    i_start = jax.lax.axis_index("i") * ni_loc - 1
    j_idx = j_start + jnp.arange(nj_loc + 2)
    i_idx = i_start + jnp.arange(ni_loc + 2)
    return (i_idx >= i0) & (i_idx <= i1), (j_idx >= j0) & (j_idx <= j1)


def _step_local(window, k0, k1, kde, mesh, arrs: dict[str, jax.Array],
                scalars: dict[str, jax.Array]) -> dict[str, jax.Array]:
    """Per-shard body: halo-exchange inputs, run the masked core, return
    owned interiors.  Runs inside shard_map."""
    j_sh = mesh.shape["j"] > 1
    i_sh = mesh.shape["i"] > 1
    padded: dict[str, jax.Array] = {}
    for name in FIELDS_3D:
        padded[name] = halo.halo3(arrs[name], j_sharded=j_sh, i_sharded=i_sh)
    for name in FIELDS_2D:
        padded[name] = halo.halo2(arrs[name], j_sharded=j_sh, i_sharded=i_sh)
    for name in FIELDS_1D:
        padded[name] = arrs[name]

    nj_loc, _, ni_loc = arrs["ww"].shape
    i_mask, j_mask = _local_masks(window, nj_loc, ni_loc)

    out = advance_mu_t_impl(
        i_mask=i_mask, j_mask=j_mask, k0=k0, k1=k1, kde=kde,
        **padded, **scalars,
    )
    res = {}
    for name, val in out.items():
        if val.ndim == 3:
            res[name] = val[1:-1, :, 1:-1]
        else:
            res[name] = val[1:-1, 1:-1]
    return res


class ShardedAdvanceMuT:
    """Compiled SPMD small-step over a device mesh.

    Build once per (mesh, domain, flags); call with domain-shaped global
    arrays.  ``n_steps > 1`` runs a device-resident ``lax.scan`` over the
    carried state (ww, mu, t, t_ave) without returning to host — the
    multi-step capability the reference's one-launch design lacks
    (SURVEY.md §2 'Distributed communication backend').
    """

    def __init__(self, mesh: Mesh, nx: int, ny: int, nz: int,
                 flags: ConfigFlags, n_steps: int = 1,
                 vary_winds: bool = False):
        """``vary_winds`` rescales u/v by (1 + 1e-7*step) inside the scan.
        In the full acoustic loop the winds are updated by advance_uv every
        small step; iterating advance_mu_t alone with frozen winds lets XLA
        hoist most of the physics out of the loop.  Benchmarks set this so
        the measured per-step work matches the real loop's data flow."""
        self.mesh = mesh
        self.flags = flags
        self.domain = (nx, ny, nz)
        self.n_steps = n_steps
        window = domain_window(nx, ny, nz, flags)
        self.window = window
        k0, k1 = window[4], window[5]
        kde = nz - 1

        s3, s2, rep = sharding3(mesh), sharding2(mesh), replicated(mesh)
        self.shardings = {**{n: s3 for n in FIELDS_3D},
                          **{n: s2 for n in FIELDS_2D},
                          **{n: rep for n in FIELDS_1D},
                          **{n: rep for n in SCALARS}}

        in_specs = ({n: self.shardings[n].spec for n in
                     FIELDS_3D + FIELDS_2D + FIELDS_1D},
                    {n: P() for n in SCALARS})
        out_specs = {n: (P("j", None, "i") if n in
                         ("ww", "t", "t_ave") else P("j", "i"))
                     for n in ("ww", "mu", "muave", "muts", "mudf", "t", "t_ave")}

        local = functools.partial(_step_local, window, k0, k1, kde, mesh)
        sharded_step = jax.shard_map(
            local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )

        def run_full(arrs, scalars):
            """Device-resident multi-step: scan n-1 steps over the carried
            state, then one explicit step so the pure 2-D outputs
            (muave/muts/mudf) of the *last* step are returned."""
            if n_steps == 1:
                return sharded_step(arrs, scalars)
            const = {k: v for k, v in arrs.items() if k not in STATE_KEYS}

            def body(state, step_idx):
                ins = {**const, **state}
                if vary_winds:
                    scale = F(1.0) + F(1e-7) * step_idx.astype(F)
                    ins = {**ins, "u": ins["u"] * scale, "v": ins["v"] * scale}
                out = sharded_step(ins, scalars)
                return {k: out[k] for k in STATE_KEYS}, None

            state0 = {k: arrs[k] for k in STATE_KEYS}
            state, _ = jax.lax.scan(body, state0, jnp.arange(n_steps - 1))
            return sharded_step({**const, **state}, scalars)

        self._run = jax.jit(run_full)

    def prepare(self, arrays: dict[str, np.ndarray]) -> dict[str, jax.Array]:
        """Pad domain-shaped arrays to mesh-divisible sizes and place them
        with the step's shardings."""
        out = {}
        for name in FIELDS_3D + FIELDS_2D:
            out[name] = jax.device_put(
                pad_to_mesh(arrays[name], self.mesh), self.shardings[name]
            )
        for name in FIELDS_1D:
            out[name] = jax.device_put(
                jnp.asarray(arrays[name], F), self.shardings[name]
            )
        return out

    def __call__(self, arrays: dict[str, Any], rdx, rdy, dts, epssm):
        scalars = {"rdx": jnp.asarray(rdx, F), "rdy": jnp.asarray(rdy, F),
                   "dts": jnp.asarray(dts, F), "epssm": jnp.asarray(epssm, F)}
        out = self._run(arrays, scalars)
        nx, ny, _ = self.domain
        # strip the mesh padding and the boundary ring -> domain-shaped
        trimmed = {}
        for name, val in out.items():
            if val.ndim == 3:
                trimmed[name] = val[RING : ny + RING, :, RING : nx + RING]
            else:
                trimmed[name] = val[RING : ny + RING, RING : nx + RING]
        return trimmed


# ---------------------------------------------------------------------- #
# Memory-window <-> domain-shaped conversion (fixture interop)
# ---------------------------------------------------------------------- #
def case_to_domain(case) -> dict[str, np.ndarray]:
    """Extract ring-shaped arrays (staggered extents + the 1-cell boundary
    ring of lateral-BC data) from a fixture Case's memory-window arrays."""
    b = case.bounds
    j0, j1 = b.mem(b.jds, "j") - RING, b.mem(b.jde, "j") + RING
    i0, i1 = b.mem(b.ids, "i") - RING, b.mem(b.ide, "i") + RING
    kw = case.kernel_kwargs()
    out = {}
    for name in FIELDS_3D + FIELDS_2D + FIELDS_1D:
        arr = np.asarray(kw[name])
        if arr.ndim == 3:
            out[name] = arr[j0 : j1 + 1, :, i0 : i1 + 1]
        elif arr.ndim == 2:
            out[name] = arr[j0 : j1 + 1, i0 : i1 + 1]
        else:
            out[name] = arr
    return out


def embed_domain(dom: np.ndarray, like: np.ndarray, bounds: GridBounds) -> np.ndarray:
    """Embed a domain-shaped result back into a memory-window array ``like``
    for comparison against memory-window goldens."""
    out = np.array(like, copy=True)
    j0, i0 = bounds.mem(bounds.jds, "j"), bounds.mem(bounds.ids, "i")
    if dom.ndim == 3:
        out[j0 : j0 + dom.shape[0], :, i0 : i0 + dom.shape[2]] = dom
    else:
        out[j0 : j0 + dom.shape[0], i0 : i0 + dom.shape[1]] = dom
    return out
