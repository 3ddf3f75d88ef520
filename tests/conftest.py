"""Test configuration: force an 8-virtual-device CPU platform, so sharding
and collective tests run without TPU hardware (SURVEY.md §4).

Notes specific to this environment:
  * A sitecustomize registers the 'axon' TPU plugin in every interpreter and
    explicitly updates jax_platforms, so the JAX_PLATFORMS env var alone is
    NOT enough — we must update jax.config after import, before any backend
    is used.
  * XLA compilations are routed through a remote compile service (~0.75 s per
    new executable); the persistent cache makes test reruns cheap.

Benchmarks (bench.py) run on the real chip; tests are hardware-free by design.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
