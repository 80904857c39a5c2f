"""Test configuration: run everything on a virtual 8-device CPU mesh.

Per SURVEY.md §4 item 4: multi-device shard_map/collective paths are
exercised under pytest on CPU via XLA's forced host platform device count;
numerics are asserted against single-device/numpy oracles. The real-TPU
path is exercised by bench.py / the driver instead.

Note: this environment's sitecustomize registers an 'axon' TPU platform and
forces ``jax_platforms='axon,cpu'`` via jax.config (so the JAX_PLATFORMS
env var alone is NOT enough) — we must override through jax.config before
any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# SURVEY §5 "race detection / sanitizers": CI can run the whole suite with
# NaN trapping and/or x64 on to catch dtype bugs —
#   SUBPIXAL_TPU_DEBUG_NANS=1 SUBPIXAL_TPU_X64=1 pytest tests/
if os.environ.get("SUBPIXAL_TPU_DEBUG_NANS"):
    jax.config.update("jax_debug_nans", True)
if os.environ.get("SUBPIXAL_TPU_X64"):
    jax.config.update("jax_enable_x64", True)

# persistent compilation cache: most of the suite's runtime is jit
# compiles; repeated runs are served from disk
from subpixal_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
