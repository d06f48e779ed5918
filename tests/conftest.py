"""Test configuration: force CPU backend with 8 virtual devices.

All unit tests run on CPU so they are hermetic and can exercise the
multi-device sharding code paths (`jax.sharding.Mesh` over 8 virtual
devices) without TPU hardware. Must run before any `import jax`.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon, so env mutations here are no-ops — the config
# updates below are the only effective way to (a) force the CPU
# backend (otherwise tests silently run on the tunneled TPU with
# remote per-op compiles) and (b) get 8 virtual devices for the
# sharding tests. Must run before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
if jax.config.jax_num_cpu_devices < 8:
    jax.config.update("jax_num_cpu_devices", 8)

# NOTE: golden tests that compare conv/matmul outputs against torch use
# `with jax.default_matmul_precision("highest")` locally — the XLA CPU
# default conv path downcasts and diverges ~1e-2 from torch f32.
# (Setting the JAX_DEFAULT_MATMUL_PRECISION env var hangs this jax
# build at import, and the global config makes every compile slow.)

# Make the repo root importable regardless of where pytest is invoked from.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
