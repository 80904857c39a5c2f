"""Zero-transfer on-device pipeline: render -> align -> final mosaic.

Demonstrates device-resident Exposures (``Exposure`` with ``jax.Array``
data): the scene is rendered on the accelerator, aligned, and
re-drizzled into the corrected mosaic without the pixel data ever
visiting the host — the composition mode for chaining subpixal_tpu
after another on-device stage (e.g. ramp fitting / calibration).

Run: ``python examples/device_pipeline.py``
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax  # noqa: E402

from subpixal_tpu.align import align_images  # noqa: E402
from subpixal_tpu.resample import Drizzle  # noqa: E402
from subpixal_tpu.testing import (  # noqa: E402
    pairwise_shift_errors,
    simulate_stack,
)
from subpixal_tpu.utils import enable_compilation_cache  # noqa: E402


def main():
    enable_compilation_cache()
    print("device:", jax.devices()[0])

    # 1. render a dithered 4-frame stack ON DEVICE (planted errors)
    exps, planted = simulate_stack(
        n_exp=4, shape=(1024, 1024), n_stars=40, seed=11, device=True)
    assert isinstance(exps[0].data, jax.Array)

    # 2. align — zero exposure bytes cross host<->device
    t0 = time.time()
    res = align_images(exposures=exps, fitgeom="shift",
                       max_iterations=5, usfac=8, fit_type="gaussian")
    err = 1e3 * pairwise_shift_errors(np.asarray(res.shifts), planted)
    print(f"aligned in {time.time() - t0:.1f}s "
          f"(setup {res.setup_s:.2f}s, {res.n_iterations} iterations, "
          f"{err:.2f} mpix vs planted)")

    # 3. final corrected mosaic (still device-resident)
    driz = Drizzle(list(res.exposures))
    driz.execute()
    print("mosaic:", driz.output_shape,
          "weight>0 fraction:",
          round(float((np.asarray(driz.output_wht) > 0).mean()), 3))


if __name__ == "__main__":
    main()
