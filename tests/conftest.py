"""Test configuration.

Tests run on a virtual 8-device CPU mesh with float64 enabled: accuracy
gates from the reference suite (test/poisson res-7.ref residual reduction to
1e-12 relative, error norms to 5e-5) need double precision; the reference is
all-double C (src/ftt.h gdouble).  TPU production paths run f32/bf16 — the
bench (bench.py) exercises those on the real chip.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The session's axon sitecustomize force-registers a TPU backend and sets
# jax_platforms programmatically; the config update (not the env var) is
# what actually pins tests to the host CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the test suite compiles many small stencil
# programs; caching makes re-runs near-instant.
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
# Cache READS only: serializing certain large CPU executables segfaults
# in put_executable_and_time on this host (two full-suite crashes with
# identical stacks) — an XLA:CPU AOT serialization bug.  A huge write
# threshold keeps warm entries usable without ever writing new ones
# from the suite; single-file runs that need caching can override via
# JAX_SUITE_CACHE_WRITES=1.
_thresh = 0.5 if os.environ.get("JAX_SUITE_CACHE_WRITES") else 360000.0
jax.config.update("jax_persistent_cache_min_compile_time_secs", _thresh)
