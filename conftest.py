"""Root conftest: force tests onto a virtual 8-device CPU mesh.

Must run before any `import jax` so the XLA platform flags take effect.
Benchmarks (`bench.py`) and the driver entry (`__graft_entry__.py`) are NOT
routed through pytest and therefore keep the real TPU platform.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: ambient env may pin the TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the train-step compiles dominate suite time.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ramdsir_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu"
# programmatically, overriding the env var — push it back to cpu before any
# backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
