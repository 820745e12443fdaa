"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors the reference's multi-GPU test strategy (test_hipStateVec_multi_gpu.cpp
runs on however many GPUs exist) without requiring hardware: XLA's host
platform is forced to expose 8 devices so sharded-statevector tests exercise
real collectives.

Note: this environment's sitecustomize imports jax and registers a TPU plugin
before conftest runs, so JAX_PLATFORMS env alone is too late — we switch the
platform via jax.config (backends initialize lazily).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
