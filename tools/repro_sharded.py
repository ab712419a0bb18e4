"""TPU repro through the sharded path at the crash-prone shape."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from wrf_tpu.io import fixtures
from wrf_tpu.parallel.mesh import make_mesh
from wrf_tpu.parallel.sharded import ShardedAdvanceMuT, case_to_domain

tj = int(sys.argv[sys.argv.index("--tj") + 1]) if "--tj" in sys.argv else None
case = fixtures.make_case(126, 62, 32, halo=1, seed=5)
nx, ny, nz = case.bounds.ide, case.bounds.jde, case.bounds.kdim
mesh = make_mesh([jax.devices()[0]], (1, 1))
step = ShardedAdvanceMuT(mesh, nx, ny, nz, case.flags, n_steps=3, tj=tj)
out = step(step.prepare(case_to_domain(case)),
           case.rdx, case.rdy, case.dts, case.epssm)
for k, v in out.items():
    a = np.asarray(v)
    assert np.isfinite(a).all(), k
print("OK sharded tj=", tj)
