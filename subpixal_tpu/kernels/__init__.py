"""Pallas TPU kernels for the hot resampling ops.

These are the device kernels promised by SURVEY.md §2a — first-class
TPU-native replacements for the reference's native compute layer
(``drizzlepac``'s C extension ``cdriz``: the ``tblot`` gather used by
``subpixal/blot.py`` and the ``tdriz`` scatter used by
``subpixal/resample.py``):

* :mod:`subpixal_tpu.kernels.blot` — separable-interpolation cutout
  gather (``cdriz.tblot`` equivalent), formulated as banded one-hot
  matmuls so the MXU does the gathering (no scalar gathers at all).
* :mod:`subpixal_tpu.kernels.drizzle` — area-overlap deposit
  (``cdriz.tdriz`` equivalent), formulated as per-block separable
  overlap matmuls accumulated tile-by-tile (no scatter at all).
* :mod:`subpixal_tpu.kernels.measure` — the fused displacement
  measurement (reference ``subpixal/cc.py`` chain): normalize ->
  forward matmul-DFT -> cross-spectrum -> windowed coarse argmax ->
  upsampled matrix-DFT window, VMEM-resident per cutout block.
  OPT-IN numeric cross-check (``SUBPIXAL_TPU_FUSED_MEASURE=1``):
  measured slower than the XLA einsum path — the module docstring
  keeps the three-attempt fusion post-mortem and the design rule.

The pure-XLA reference implementations live in
:mod:`subpixal_tpu.ops.interp` and :mod:`subpixal_tpu.ops.drizzle`; both
paths are numerically cross-checked in ``tests/test_pallas_kernels.py``.
Use :func:`subpixal_tpu.kernels.use_pallas` to decide dispatch.
"""

from __future__ import annotations

import jax

__all__ = ["use_pallas", "sample_cutouts_pallas", "drizzle_deposit_pallas",
           "measure_displacement_rank3"]


def use_pallas(requested: bool | str = "auto") -> bool:
    """Dispatch decision for the Pallas kernel paths.

    ``True``/``False`` force; ``"auto"`` enables them on TPU backends
    (the Mosaic kernels compile for TPU only — on CPU the XLA paths are
    used, and tests exercise the kernels in interpreter mode).
    """
    if requested in (True, False):
        return bool(requested)
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:  # pragma: no cover - no backend at all
        return False


from .blot import sample_cutouts_pallas  # noqa: E402
from .drizzle import drizzle_deposit_pallas  # noqa: E402
from .measure import measure_displacement_rank3  # noqa: E402
