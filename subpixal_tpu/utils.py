"""Small host-side helpers.

Parity with the reference's ``subpixal/utils.py`` (SURVEY.md §2 #9),
notably parsing ``"image.fits[sci,1]"``-style file specifications.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["parse_file_name", "py2round", "enable_compilation_cache",
           "fetch_to_host", "sync_probe"]


def enable_compilation_cache(path: str | None = None,
                             min_compile_secs: float = 0.0) -> str:
    """Turn on JAX's persistent compilation cache.

    First compiles of the jitted align step / kernels cost 10–80 s on
    TPU; with the cache they are served from disk on every subsequent
    process (verified to work through remote-compile tunnels). Called by
    ``bench.py``, ``__graft_entry__`` and the test suite; library users
    should call it once at startup.

    ``min_compile_secs`` defaults to 0 — cache EVERY executable. On
    remote-compile runtimes even trivial eager ops
    (convert_element_type, broadcast_in_dim, ...) cost ~0.35 s of RPC
    round trips each; one measured align setup issued 60 such compiles
    (~21 s/process) that JAX's default 0.5 s floor would silently
    re-pay in every process forever. The tiny cache entries (~KB) are
    far cheaper than the recompiles.

    The default path is keyed by the active JAX backend: remote-compile
    backends (axon) emit host-CPU executables with compile-server
    machine features (``+prefer-no-gather`` etc.) that a local
    CPU-only process would otherwise load — XLA warns "could lead to
    execution errors such as SIGILL" (observed 2026-08-18). Separate
    dirs keep each compile provenance to itself.
    """
    import os

    import jax

    if path is None:
        try:
            backend = jax.default_backend()
        except RuntimeError:  # pragma: no cover - no backend at all
            backend = "none"
        path = os.path.join(os.path.expanduser("~"), ".cache",
                            f"subpixal_tpu_xla_{backend}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return path

_EXT_RE = re.compile(r"^(?P<file>.+?)(?:\[(?P<ext>[^\]]+)\])?$")


def parse_file_name(image_fname: str) -> tuple[str, int | tuple[str, int] | None]:
    """Split ``"name.fits[sci,2]"`` into (``"name.fits"``, ``("SCI", 2)``).

    Parity: reference ``subpixal/utils.py · parse_file_name``. Supported
    extension specs: ``[3]`` (integer index), ``[sci]`` (name, ver 1
    implied -> returned as ``("SCI", 1)``), ``[sci,2]`` (name, ver).
    Returns ``(filename, None)`` when no extension is given.
    """
    m = _EXT_RE.match(image_fname.strip())
    if m is None:  # pragma: no cover - regex always matches
        raise ValueError(f"cannot parse file name: {image_fname!r}")
    fname = m.group("file")
    ext = m.group("ext")
    if ext is None:
        return fname, None
    parts = [p.strip() for p in ext.split(",")]
    if len(parts) == 1:
        if re.fullmatch(r"[+-]?\d+", parts[0]):
            return fname, int(parts[0])
        return fname, (parts[0].upper(), 1)
    if len(parts) == 2:
        return fname, (parts[0].upper(), int(parts[1]))
    raise ValueError(f"invalid extension specification in {image_fname!r}")


def py2round(x: float) -> float:
    """Round-half-away-from-zero (Python-2 style), as used by the
    reference for pixel index math."""
    import math

    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


#: default chunk size for device->host fetches (bytes); 0 = fetch
#: whole (the default). Measured on the tunneled runtime (2026-08-17):
#: in its degraded state EVERY multi-MB d2h fetch stalls 80-500 s
#: regardless of size (8 MB chunks each stalled: 693 s total vs 319 s
#: whole), while KB-class fetches never stall — so chunking multiplies
#: the stall lottery and is OFF by default; the
#: SUBPIXAL_TPU_FETCH_CHUNK_BYTES env knob remains for direct-attached
#: hardware experiments. The align driver's answer is to not fetch
#: mosaics at all (device catalog, catalogs/device.py).
FETCH_CHUNK_BYTES = 0


#: fetches larger than this first wait for the producing program via a
#: scalar probe (see :func:`sync_probe`); KB-class fetches skip it.
_PROBE_MIN_BYTES = 65536


def sync_probe(arr) -> None:
    """Cheaply wait for a device array's producing program to finish.

    A BULK device->host fetch issued while the producing program is
    still running (or queued) stalls 40-110 s on tunneled runtimes —
    the relay's completion poll for in-flight large transfers backs
    off pathologically (measured 2026-08-18: a 360 KB table fetch
    issued right after the drizzle deposits stalled 42-113 s; a scalar
    fetch first waited 3 s for the same programs, after which the bulk
    fetch took 50 ms). Fetching ONE element first synchronizes through
    the cheap scalar path. ``jax.block_until_ready`` is NOT a
    substitute: on the tunneled backend it returns before remote
    execution completes (measured same day).
    """
    try:
        import jax
        import jax.numpy as jnp

        if not isinstance(arr, jax.Array):
            return
        x = arr[(0,) * arr.ndim] if arr.ndim else arr
        if jnp.issubdtype(arr.dtype, jnp.complexfloating):
            x = jnp.real(x)  # complex d2h is UNIMPLEMENTED on axon
        np.asarray(x)
    except Exception:
        pass  # best-effort: the bulk fetch below still returns the data


def fetch_to_host(arr, chunk_bytes: int | None = None):
    """Device->host fetch of a 2-D+ array in bounded row slices.

    ``np.asarray`` on a multi-hundred-MB device buffer is pathological
    on tunneled runtimes (see :data:`FETCH_CHUNK_BYTES`); slicing the
    leading axis bounds each transfer. Override the chunk size with
    ``chunk_bytes`` or the ``SUBPIXAL_TPU_FETCH_CHUNK_BYTES`` env var.
    Fetches beyond 64 KB are preceded by a :func:`sync_probe` so the
    bulk transfer never races the producing program.
    """
    import os

    import numpy as np

    if chunk_bytes is None:
        chunk_bytes = int(os.environ.get("SUBPIXAL_TPU_FETCH_CHUNK_BYTES",
                                         FETCH_CHUNK_BYTES))
    nbytes = getattr(arr, "nbytes", 0) or 0
    if nbytes >= _PROBE_MIN_BYTES:
        sync_probe(arr)
    if getattr(arr, "is_fully_addressable", True) is False:
        # multi-process global array: some shards live on other hosts —
        # np.asarray would raise. All processes reach this point (SPMD
        # host code), so collective all-gathers are safe. CHUNKED along
        # the leading axis: a whole-array process_allgather replicates
        # the result into EVERY device's memory first, which would OOM
        # on exactly the row-band-sharded mosaics this path serves —
        # each bounded chunk replicates transiently instead.
        from jax.experimental import multihost_utils

        def _ag(x):
            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True))

        if not hasattr(arr, "shape") or arr.ndim < 2:
            return _ag(arr)
        n = arr.shape[0]
        row_bytes = max(1, int(np.prod(arr.shape[1:]))
                        * arr.dtype.itemsize)
        if chunk_bytes <= 0 or n * row_bytes <= chunk_bytes:
            return _ag(arr)
        step = max(1, chunk_bytes // row_bytes)
        out = np.empty(arr.shape, arr.dtype)
        for i in range(0, n, step):
            out[i:i + step] = _ag(arr[i:i + step])
        return out
    if not hasattr(arr, "shape") or arr.ndim < 2:
        return np.asarray(arr)
    n = arr.shape[0]
    row_bytes = max(1, int(np.prod(arr.shape[1:])) * arr.dtype.itemsize)
    if chunk_bytes <= 0 or n * row_bytes <= chunk_bytes:
        return np.asarray(arr)
    step = max(1, chunk_bytes // row_bytes)
    out = np.empty(arr.shape, arr.dtype)
    for i in range(0, n, step):
        out[i:i + step] = np.asarray(arr[i:i + step])
    return out
