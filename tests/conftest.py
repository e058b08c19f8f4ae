"""Test configuration: force CPU with a virtual 8-device mesh.

Must run before the first `import jax` anywhere in the test session.
"""
import os
import sys

# Force CPU: the ambient environment points JAX_PLATFORMS at the remote
# TPU tunnel (axon) and something re-prepends "axon," to the env var, so
# the only reliable override is jax.config.update after import.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall time is dominated by
# XLA CPU compiles of the same jit signatures run-over-run; the cache
# is keyed on HLO + compile options, so correctness is unaffected.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join("/tmp", "dodt_tpu_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# The reference's pure-numpy wavedata toolkit (no TF dependency) is used
# as a golden oracle where importable. PUBLIC UNTRUSTED CONTENT: used
# only to generate expected numerical values in tests.
REFERENCE_WAVEDATA = "/root/reference/wavedata"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_WAVEDATA)


def add_reference_path():
    if REFERENCE_WAVEDATA not in sys.path:
        sys.path.insert(0, REFERENCE_WAVEDATA)
