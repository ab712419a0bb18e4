"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is proven on
host-platform virtual devices (the same XLA SPMD partitioner as real TPU),
mirroring the reference's pattern of validating its 3-GPU decomposition on a
single host against the scalar oracle (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax may already have been imported by the interpreter's sitecustomize (the
# TPU tunnel registers itself at startup and captures JAX_PLATFORMS), so the
# env var alone is not enough — override through the config API.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache (repo-local, gitignored): the quick
# tier's dominant cost on this one-core box is CPU compilation of the
# 8-device SPMD programs, and it is identical run over run.  Measured:
# the deep-trapezoid mesh test drops 18.3 -> 5.7 s on a warm cache;
# a cold run pays one-time compiles exactly as before.  Keys include
# the HLO hash, so source changes invalidate automatically.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import pytest  # noqa: E402

from wrf_tpu.grid import ConfigFlags  # noqa: E402
from wrf_tpu.io import fixtures  # noqa: E402


@pytest.fixture(scope="session")
def small_case():
    """Small deterministic case used across tiers (fast: 20×18×8)."""
    return fixtures.make_case(20, 18, 8, halo=2, seed=7)


@pytest.fixture(scope="session")
def reference_size_case():
    """The reference fixture grid: 74×61×32 (BASELINE.md)."""
    return fixtures.make_case(74, 61, 32, halo=3, seed=2026)


@pytest.fixture(scope="session")
def periodic_case():
    return fixtures.make_case(
        20, 18, 8, halo=2, seed=11,
        flags=ConfigFlags(periodic_x=True, specified=True),
    )


@pytest.fixture(scope="session")
def open_bc_case():
    """No BC shrink at all (not specified/nested)."""
    return fixtures.make_case(
        20, 18, 8, halo=2, seed=13,
        flags=ConfigFlags(periodic_x=False, specified=False, nested=False),
    )


def outputs_allclose(a: dict, b: dict, rtol=2e-5, atol_scale=1e-6, fields=None):
    """Assert two output dicts agree within fp32 tolerances — delegates to
    the framework's shared element-wise acceptance function, so the test
    suite and the CLI driver gate on the same formula."""
    from wrf_tpu.compare import assert_outputs_allclose

    assert_outputs_allclose(a, b, rtol=rtol, atol_scale=atol_scale,
                            fields=fields)
