"""Multi-host bring-up: the executable form of SCALING.md's recipe.

Single-host runs need none of this — ``make_mesh`` over ``jax.devices()``
is enough.  On a multi-host slice, each host process calls
:func:`initialize` once, builds the global mesh with :func:`global_mesh`,
and feeds its host-local slab of every field through
:func:`host_local_arrays`; ``SmallStepLoop``/``RK3Integrator`` then run
unchanged (the programs are SPMD and mesh-shape-agnostic — the same code
is validated on virtual multi-device meshes in CI, and the collectives are
nearest-neighbor ``ppermute`` rides on ICI/DCN).

Real multi-host TPU hardware is unavailable in this environment, but the
recipe itself is validated across TRUE process boundaries:
``tools/multihost_check.py`` runs two OS processes (4 virtual CPU devices
each) through ``jax.distributed.initialize`` + Gloo collectives, builds
the global (2, 4) mesh, assembles per-process j-slabs with
:func:`host_local_arrays`, and proves both production loops BIT-equal to
the identical program run single-process on the same mesh
(``tests/test_sharded.py::test_multihost_two_process`` gates it in CI;
``test_distributed_helpers`` keeps the single-process degenerate path).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh


def initialize(**kwargs) -> None:
    """Initialize the JAX distributed runtime (idempotent wrapper).

    On TPU pods the coordinator address / process ids are auto-detected;
    kwargs pass through.  Explicit configuration errors surface; only the
    single-process no-coordinator case (and double initialization) are
    tolerated silently so the same entry point runs everywhere."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # Benign only in the auto-detected single-process case: double
        # initialization, or a backend already brought up locally.  With an
        # explicit cluster config every RuntimeError (coordinator
        # connection/config failure included) must surface — swallowing it
        # would silently leave a process-local device view and fail later
        # in host_local_arrays with an obscure error.
        if kwargs:
            raise
        msg = str(e).lower()
        if ("already initialized" not in msg
                and "should only be called once" not in msg
                and "before any jax calls" not in msg):
            # "should only be called once" is jax 0.9's actual
            # double-initialization wording; older releases said
            # "already initialized"
            raise
    except ValueError:
        if kwargs:
            raise  # the caller explicitly configured a cluster: surface it
        # single-process environment with no coordinator: stay local


def global_mesh(shape: tuple[int, int] | None = None) -> Mesh:
    """(j, i) mesh over every device of every process."""
    devices = jax.devices()
    if shape is None:
        nj = int(math.sqrt(len(devices)))
        while len(devices) % nj:
            nj -= 1
        shape = (nj, len(devices) // nj)
    return make_mesh(devices, shape)


def host_local_arrays(mesh: Mesh, arrays: dict[str, np.ndarray],
                      shardings: dict[str, NamedSharding]) -> dict:
    """Assemble global jax.Arrays from per-host slabs.

    ``arrays`` holds each field's HOST-LOCAL slab (this process's rows of
    the j-decomposition, full extent on unsharded axes), already padded to
    mesh-divisible global sizes like ``pad_to_mesh`` does.  Replicated
    (1-D) fields pass the full vector on every host."""
    out = {}
    for name, arr in arrays.items():
        sh = shardings[name]
        if sh.spec == P():
            out[name] = jax.device_put(jnp.asarray(arr, jnp.float32), sh)
            continue
        # hosts own contiguous j-slabs (the j axis is the outer mesh axis)
        global_shape = (arr.shape[0] * jax.process_count(),) + arr.shape[1:]
        out[name] = jax.make_array_from_process_local_data(
            sh, np.asarray(arr, np.float32), global_shape
        )
    return out
