"""Halo exchange over the device mesh.

The reference stages 3-row j halos from the host once per kernel launch
(reference: advance_mu_t_no_async.cu:136-160, 245-306); devices never talk to
each other.  The TPU-native replacement exchanges the 1-cell halo the stencil
actually needs (the kernel's reads are ±1 in i and j, SURVEY.md §2) directly
between neighbor chips with ``lax.ppermute``, which XLA lowers to ICI
point-to-point transfers.  Wrap-around rows that land on global-domain edges
carry garbage and are excluded by the compute-window masks — every shard runs
the identical SPMD program.

These helpers run *inside* ``shard_map``: they take the local block and
return the block padded by one halo cell on the decomposed axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _perm_shift(axis_name: str, shift: int) -> list[tuple[int, int]]:
    """Ring permutation sending each shard's slice to ``shard + shift``."""
    n = lax.axis_size(axis_name)
    return [(s, (s + shift) % n) for s in range(n)]


def exchange_axis(x: jax.Array, axis: int, axis_name: str) -> jax.Array:
    """Pad ``x`` with one halo cell on both sides of ``axis``, filled with
    the neighboring shards' edge cells (ring exchange; edges masked)."""
    lo = lax.slice_in_dim(x, 0, 1, axis=axis)
    hi = lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
    # our top row goes to the next shard's bottom halo, and vice versa
    from_prev = lax.ppermute(hi, axis_name, _perm_shift(axis_name, +1))
    from_next = lax.ppermute(lo, axis_name, _perm_shift(axis_name, -1))
    return jnp.concatenate([from_prev, x, from_next], axis=axis)


def pad_axis(x: jax.Array, axis: int) -> jax.Array:
    """Pad one zero cell on both sides of ``axis`` (unsharded axes, so all
    shards keep congruent shapes)."""
    pads = [(0, 0, 0)] * x.ndim
    pads[axis] = (1, 1, 0)
    return lax.pad(x, jnp.zeros((), x.dtype), pads)


def with_halo(x: jax.Array, *, j_axis: int, i_axis: int,
              j_sharded: bool, i_sharded: bool) -> jax.Array:
    """Return the local block padded by a 1-cell halo in j and i —
    exchanged with mesh neighbors on sharded axes, zero-padded otherwise."""
    x = exchange_axis(x, j_axis, "j") if j_sharded else pad_axis(x, j_axis)
    x = exchange_axis(x, i_axis, "i") if i_sharded else pad_axis(x, i_axis)
    return x


def refresh_axis(xp: jax.Array, axis: int, axis_name: str,
                 n_interior: int | None = None) -> jax.Array:
    """Refresh the 1-cell halo of an ALREADY-padded local block along
    ``axis`` from the neighbors' interior edges (in-loop exchange for fields
    that changed during a scan step).  Compiles to in-place dynamic updates
    inside ``lax.scan`` carries.

    ``n_interior``: owned extent (halo cells sit at 0 and n_interior+1);
    defaults to ``shape[axis] - 2`` — pass it when extra alignment padding
    follows the high halo row.
    """
    n_int = (xp.shape[axis] - 2) if n_interior is None else n_interior
    lo_int = lax.slice_in_dim(xp, 1, 2, axis=axis)               # first owned
    hi_int = lax.slice_in_dim(xp, n_int, n_int + 1, axis=axis)   # last owned
    from_prev = lax.ppermute(hi_int, axis_name, _perm_shift(axis_name, +1))
    from_next = lax.ppermute(lo_int, axis_name, _perm_shift(axis_name, -1))
    starts_lo = [0] * xp.ndim
    starts_hi = [0] * xp.ndim
    starts_hi[axis] = n_int + 1
    xp = lax.dynamic_update_slice(xp, from_prev, starts_lo)
    return lax.dynamic_update_slice(xp, from_next, starts_hi)


def remote_refresh_axis(xp: jax.Array, axis_name: str,
                        n_interior: int | None = None,
                        collective_id: int = 0,
                        interpret: bool = False) -> jax.Array:
    """``refresh_axis`` (axis 0) implemented as explicit Pallas
    ring-neighbor remote DMA (``pltpu.make_async_remote_copy``) instead of
    XLA ``ppermute`` — the chip-to-chip path SURVEY.md §7 calls for when
    halo transfers should overlap in-kernel compute.

    Each shard RDMAs its first/last interior rows straight into its
    neighbors' halo slots of the aliased output block; ``rdma.wait()``
    pairs every send with the matching receive, so the exchange needs no
    separate barrier.  On this framework's measured balance the halo
    traffic is <3% of substep time (SCALING.md), so the production loops
    keep the simpler ``ppermute`` form; this backend is validated against
    it on the virtual multi-device mesh and stands ready for slices where
    overlap matters.  (Pallas LOGICAL device ids address a single named
    mesh axis — use a 1-axis mesh, or extend to MESH coordinates for 2-D
    decompositions.)
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_int = (xp.shape[0] - 2) if n_interior is None else n_interior

    def kernel(x_ref, o_ref, send_lo, recv_lo, send_hi, recv_hi):
        del x_ref  # aliased onto o_ref
        my = lax.axis_index(axis_name)
        n = lax.axis_size(axis_name)
        nxt = lax.rem(my + 1, n)
        prv = lax.rem(my + n - 1, n)
        # neighbor barrier: an RDMA writes into the neighbor's DONATED
        # buffer, so both neighbors must have entered the kernel (and thus
        # finished every earlier read of that buffer) before any send.
        # Interpret mode executes shards synchronously (no race) and
        # cannot lower the barrier semaphore, so the barrier is compiled
        # in only for real hardware.
        if not interpret:
            barrier = pltpu.get_barrier_semaphore()
            pltpu.semaphore_signal(barrier, inc=1, device_id=nxt,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_signal(barrier, inc=1, device_id=prv,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_wait(barrier, 2)
        # my last interior row -> next shard's low halo slot
        up = pltpu.make_async_remote_copy(
            src_ref=o_ref.at[pl.ds(n_int, 1)],
            dst_ref=o_ref.at[pl.ds(0, 1)],
            send_sem=send_hi, recv_sem=recv_lo,
            device_id=nxt, device_id_type=pltpu.DeviceIdType.LOGICAL)
        # my first interior row -> previous shard's high halo slot
        down = pltpu.make_async_remote_copy(
            src_ref=o_ref.at[pl.ds(1, 1)],
            dst_ref=o_ref.at[pl.ds(n_int + 1, 1)],
            send_sem=send_lo, recv_sem=recv_hi,
            device_id=prv, device_id_type=pltpu.DeviceIdType.LOGICAL)
        up.start()
        down.start()
        up.wait()
        down.wait()

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        input_output_aliases={0: 0},
        scratch_shapes=[pltpu.SemaphoreType.DMA(())] * 4,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id),
        interpret=interpret,
    )(xp)


def halo3(x: jax.Array, j_sharded: bool = True, i_sharded: bool = True) -> jax.Array:
    """(j, k, i) local block -> (j+2, k, i+2)."""
    return with_halo(x, j_axis=0, i_axis=2, j_sharded=j_sharded, i_sharded=i_sharded)


def halo2(x: jax.Array, j_sharded: bool = True, i_sharded: bool = True) -> jax.Array:
    """(j, i) local block -> (j+2, i+2)."""
    return with_halo(x, j_axis=0, i_axis=1, j_sharded=j_sharded, i_sharded=i_sharded)
