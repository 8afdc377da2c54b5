"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Environment variables must be set before jax initializes its backends, so
this happens at conftest import time (pytest imports conftest before any
test module).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin ignores the JAX_PLATFORMS env var, so force the CPU
# backend through the config API as well (before any backend is initialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# The upstream reference (read-only) doubles as a numerical oracle when
# present; tests that use it skip gracefully when it is absent.
REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
