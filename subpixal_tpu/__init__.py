"""subpixal_tpu — TPU-native subpixel cross-correlation image alignment.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``spacetelescope/subpixal`` (see SURVEY.md): catalog-driven cutout
extraction, batched FFT cross-correlation with Fourier-domain upsampling,
subpixel peak fitting, sigma-clipped linear WCS-correction fits, and
blot/drizzle resampling — all batched, jit-compiled, and shardable over
TPU device meshes. Host-side FITS/WCS I/O and catalog bookkeeping are
self-contained (no astropy dependency).
"""

from .version import __version__

from .ops.peaks import find_peak, PeakFitResult
from .ops.correlate import cross_correlate, find_displacement, Displacement

__all__ = [
    "__version__",
    "find_peak",
    "PeakFitResult",
    "cross_correlate",
    "find_displacement",
    "Displacement",
]
