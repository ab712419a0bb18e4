"""Minimal TPU repro for the fused kernel (full stderr captured)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from wrf_tpu.io import fixtures
from wrf_tpu.ops.advance_mu_t_pallas import advance_mu_t_pallas

fuse = "--fuse" in sys.argv
tave = "--no-tave" not in sys.argv
tj = int(sys.argv[sys.argv.index("--tj") + 1]) if "--tj" in sys.argv else None

case = fixtures.make_case(126, 62, 32, halo=1, seed=5)
kw = case.kernel_kwargs()
i0, i1, j0, j1, k0, k1 = case.bounds.loop_bounds(case.flags)

import functools
call = advance_mu_t_pallas
if "--jit" in sys.argv:
    call = jax.jit(functools.partial(advance_mu_t_pallas),
                   static_argnames=("window", "k0", "k1", "kde", "fuse_uv",
                                    "cs2", "with_tave", "tj", "interpret",
                                    "wind_scale", "offsets"))
import inspect
sig = inspect.signature(advance_mu_t_pallas).parameters
extra = {}
if "fuse_uv" in sig:
    extra = dict(fuse_uv=fuse, cs2=25.0, with_tave=tave)
out = call(
    **{k: kw[k] for k in (
        "ww", "ww_1", "u", "u_1", "v", "v_1", "mu", "mut", "muu", "muv",
        "t", "t_1", "ft", "mu_tend", "dnw", "fnm", "fnp", "rdnw",
        "msfuy", "msfvx_inv", "msftx", "msfty",
        "rdx", "rdy", "dts", "epssm")},
    t_ave=kw["t_ave"] if (tave or "fuse_uv" not in sig) else None,
    window=(i0, i1, j0, j1), k0=k0, k1=k1, kde=case.bounds.kdim - 1,
    tj=tj, **extra,
)
for k, v in out.items():
    a = np.asarray(v)
    assert np.isfinite(a).all(), k
    print(k, a.shape, float(np.abs(a).max()))
print("OK fuse=", fuse, "tave=", tave, "tj=", tj)
