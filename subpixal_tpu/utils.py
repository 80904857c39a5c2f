"""Small host-side helpers.

Parity with the reference's ``subpixal/utils.py`` (SURVEY.md §2 #9),
notably parsing ``"image.fits[sci,1]"``-style file specifications.
"""

from __future__ import annotations

import re

__all__ = ["parse_file_name", "py2round", "enable_compilation_cache",
           "fetch_to_host"]


def enable_compilation_cache(path: str | None = None,
                             min_compile_secs: float = 0.5) -> str:
    """Turn on JAX's persistent compilation cache.

    First compiles of the jitted align step / kernels cost 10–80 s on
    TPU; with the cache they are served from disk on every subsequent
    process (verified to work through remote-compile tunnels). Called by
    ``bench.py``, ``__graft_entry__`` and the test suite; library users
    should call it once at startup.
    """
    import os

    import jax

    if path is None:
        path = os.path.join(os.path.expanduser("~"), ".cache",
                            "subpixal_tpu_xla")
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


def fetch_to_host(arr, chunk_bytes: int | None = None):
    """Device->host fetch of a 2-D+ array in bounded row slices.

    ``np.asarray`` on a multi-hundred-MB device buffer is pathological
    on tunneled runtimes (see :data:`FETCH_CHUNK_BYTES`); slicing the
    leading axis bounds each transfer. Override the chunk size with
    ``chunk_bytes`` or the ``SUBPIXAL_TPU_FETCH_CHUNK_BYTES`` env var.
    """
    import os

    import numpy as np

    if chunk_bytes is None:
        chunk_bytes = int(os.environ.get("SUBPIXAL_TPU_FETCH_CHUNK_BYTES",
                                         FETCH_CHUNK_BYTES))
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
