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

# Full f32 matmul/conv precision for golden parity against torch CPU.
# NOTE: must be set via config.update after import — setting the
# JAX_DEFAULT_MATMUL_PRECISION env var hangs this jax build at import.
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

# Make the repo root importable regardless of where pytest is invoked from.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
