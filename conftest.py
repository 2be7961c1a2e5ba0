"""Root conftest: force tests onto a virtual 8-device CPU mesh.

Must run before any `import jax` so the XLA platform flags take effect.
Benchmarks (`bench.py`) and the driver entry (`__graft_entry__.py`) are NOT
routed through pytest and therefore keep the real TPU platform.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
