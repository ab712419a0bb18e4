"""TPU relay health gating — the single source of truth.

The axon-relayed worker restarts take 1-3 min after a routine fault, but
a vmem-limit-class fault keeps it down for 45+ min (measured,
tools/tj_sweep.py), so gates default to ~20 min of patience.  Two
variants share the tuning:

* :func:`wait_healthy_inline` — probe from THIS process (bench.py):
  fine when the process has not itself faulted its client.
* :func:`wait_healthy_subprocess` — probe from a fresh subprocess
  (vmem_probe / tj_sweep): required between fault-prone configs, since
  a faulted client cannot recover in-process.
"""

from __future__ import annotations

import subprocess
import sys
import time

ATTEMPTS = 40
PAUSE = 30.0

_PROBE = ("import jax.numpy as jnp;"
          "assert float(jnp.ones((8,128)).sum())==1024.0")


def wait_healthy_inline(attempts: int = ATTEMPTS,
                        pause: float = PAUSE) -> None:
    """Gate on a trivial in-process computation; raises if the backend
    never recovers."""
    import jax.numpy as jnp

    for _ in range(attempts):
        try:
            if float(jnp.ones((8, 128)).sum()) == 1024.0:
                return
        except Exception:
            pass
        time.sleep(pause)
    raise RuntimeError("TPU backend unhealthy after retries")


def healthy_subprocess(timeout: float = 60.0) -> bool:
    """One health probe in a fresh subprocess (survives client faults)."""
    r = subprocess.run([sys.executable, "-c", _PROBE],
                       capture_output=True, timeout=timeout + 30)
    return r.returncode == 0


def wait_healthy_subprocess(attempts: int = ATTEMPTS,
                            pause: float = PAUSE) -> bool:
    for _ in range(attempts):
        try:
            if healthy_subprocess():
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(pause)
    return False
