"""Multi-host scaffolding (SURVEY §2b/§5; VERDICT r1 item 7).

A REAL 2-process ``jax.distributed`` run on CPU (subprocess-spawned,
gloo collectives): each process owns half of a synthetic displacement
batch, assembles it into a globally-sharded array, and runs the
psum-reduced sigma-clipped fit under shard_map over the global mesh.
The result must agree with the single-process fit. No multi-host
hardware claim — this proves the plumbing + collective path.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _scene(seed=4):
    """Synthetic matched positions with a planted affine + outliers."""
    rng = np.random.default_rng(seed)
    N = 48
    uv = rng.uniform(0, 200, (N, 2))
    M = np.array([[1.0005, -3e-4], [2.5e-4, 0.9996]])
    t = np.array([0.31, -0.22])
    xy = uv @ M.T + t + rng.normal(0, 0.005, (N, 2))
    xy[3] += 8.0   # outliers the sigma-clip must reject globally
    xy[17] -= 6.0
    w = np.ones(N)
    return xy.astype(np.float32), uv.astype(np.float32), w.astype(np.float32)


_WORKER = r"""
import json, os, sys
sys.path.insert(0, "__REPO__")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from subpixal_tpu.parallel import (init_distributed, make_global_mesh,
                                   global_batch_from_local, process_info)

pid = int(sys.argv[1])
ok = init_distributed(coordinator_address=sys.argv[2],
                      num_processes=2, process_id=pid)
assert ok, "distributed init returned False"
idx, count = process_info()
assert (idx, count) == (pid, 2), (idx, count)

import numpy as np
import jax.numpy as jnp
from functools import partial
from jax.sharding import PartitionSpec as P
from subpixal_tpu.ops.fit import iter_linear_fit_sharded

xy, uv, w = eval(sys.argv[3])  # nested lists -> arrays
xy = np.asarray(xy, np.float32); uv = np.asarray(uv, np.float32)
w = np.asarray(w, np.float32)
N = xy.shape[0]
lo, hi = (0, N // 2) if pid == 0 else (N // 2, N)

mesh = make_global_mesh()
assert mesh.devices.size == 4, mesh  # 2 procs x 2 local cpu devices
xy_g = global_batch_from_local(xy[lo:hi], mesh)
uv_g = global_batch_from_local(uv[lo:hi], mesh)
w_g = global_batch_from_local(w[lo:hi], mesh)

@partial(jax.shard_map, mesh=mesh,
         in_specs=(P("cutouts"), P("cutouts"), P("cutouts")),
         out_specs=(P(), P(), P(), P(), P(), P(), P("cutouts")))
def run(a, b, ww):
    return tuple(iter_linear_fit_sharded(
        a, b, ww, axis_name="cutouts", fitgeom="general",
        nclip=3, sigma=3.0))

out = jax.jit(run)(xy_g, uv_g, w_g)
if pid == 0:
    print("RESULT " + json.dumps({
        "matrix": np.asarray(out[0]).tolist(),
        "shift": np.asarray(out[1]).tolist(),
        "nmatches": int(np.asarray(out[5])),
    }), flush=True)
"""


def test_two_process_psum_fit_matches_single_process(tmp_path):
    xy, uv, w = _scene()

    # single-process oracle on the plain (unsharded) fit
    from subpixal_tpu.ops.fit import iter_linear_fit

    ref = iter_linear_fit(xy, uv, wxy=w, fitgeom="general",
                          nclip=3, sigma=3.0)
    ref_M = np.asarray(ref.matrix)
    ref_t = np.asarray(ref.shift)

    port = _free_port()
    coord = f"127.0.0.1:{port}"
    scene_repr = repr((xy.tolist(), uv.tolist(), w.tolist()))
    code = _WORKER.replace("__REPO__", os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count

    procs = [subprocess.Popen(
        [sys.executable, "-c", code, str(pid), coord, scene_repr],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so}\n{se}"

    line = next(ln for ln in outs[0][0].splitlines()
                if ln.startswith("RESULT "))
    got = json.loads(line[len("RESULT "):])
    np.testing.assert_allclose(got["matrix"], ref_M, atol=2e-5)
    np.testing.assert_allclose(got["shift"], ref_t, atol=2e-3)
    # the planted outliers were clipped globally, not per shard
    assert got["nmatches"] == int(np.asarray(ref.nmatches)) == 46


def test_init_distributed_noop_single_process():
    """No coordinator/env -> single-process no-op returning False."""
    from subpixal_tpu.parallel import init_distributed

    assert init_distributed() is False


_ALIGN_WORKER = r"""
import json, os, sys
sys.path.insert(0, "__REPO__")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from subpixal_tpu.parallel import init_distributed, make_global_mesh

pid = int(sys.argv[1])
assert init_distributed(coordinator_address=sys.argv[2],
                        num_processes=2, process_id=pid)

import numpy as np
from subpixal_tpu.align import align_images
from subpixal_tpu.resample import Exposure
from subpixal_tpu.wcs.wcs import TanWCS

# identical deterministic scene on every host
rng = np.random.default_rng(21)
E, shape, ns = 2, (96, 96), 6
cd = (0.05 / 3600.0) * np.array([[-1.0, 0.0], [0.0, 1.0]])
stars = rng.uniform(18, shape[1] - 18, (ns, 2))
yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float32)
exps = []
for e in range(E):
    dx, dy = rng.uniform(-0.3, 0.3, 2)
    img = rng.normal(0, 0.01, shape).astype(np.float32)
    for sx, sy in stars:
        r2 = (xx - sx - dx) ** 2 + (yy - sy - dy) ** 2
        img += np.where(r2 < 36.0, 20.0 * np.exp(-r2 / (2 * 1.5 ** 2)),
                        0.0).astype(np.float32)
    wcs = TanWCS(crpix=np.array([shape[1] / 2, shape[0] / 2]),
                 crval=np.array([150.0, 2.0]), cd=cd)
    exps.append(Exposure(img, wcs, name=f"w{e}"))

mesh = make_global_mesh()
assert mesh.devices.size == 4, mesh
res = align_images(exposures=exps, mesh=mesh, fitgeom="shift",
                   max_iterations=2, usfac=4, fit_type="gaussian",
                   cutout_shape=(16, 16), min_sources=3)
if pid == 0:
    print("RESULT " + json.dumps({
        "shifts": np.asarray(res.shifts).tolist(),
        "n_iterations": res.n_iterations,
    }), flush=True)
"""


def test_two_process_full_align_matches_single_process():
    """The ENTIRE align iteration (re-drizzle + measure + fit) across two
    jax.distributed processes agrees with the single-process fixed point
    (SURVEY §2b: same SPMD program, collectives over the process mesh)."""
    import numpy as np

    from subpixal_tpu.align import align_images
    from subpixal_tpu.resample import Exposure
    from subpixal_tpu.wcs.wcs import TanWCS

    rng = np.random.default_rng(21)
    E, shape, ns = 2, (96, 96), 6
    cd = (0.05 / 3600.0) * np.array([[-1.0, 0.0], [0.0, 1.0]])
    stars = rng.uniform(18, shape[1] - 18, (ns, 2))
    yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float32)
    exps = []
    for e in range(E):
        dx, dy = rng.uniform(-0.3, 0.3, 2)
        img = rng.normal(0, 0.01, shape).astype(np.float32)
        for sx, sy in stars:
            r2 = (xx - sx - dx) ** 2 + (yy - sy - dy) ** 2
            img += np.where(r2 < 36.0,
                            20.0 * np.exp(-r2 / (2 * 1.5 ** 2)),
                            0.0).astype(np.float32)
        wcs = TanWCS(crpix=np.array([shape[1] / 2, shape[0] / 2]),
                     crval=np.array([150.0, 2.0]), cd=cd)
        exps.append(Exposure(img, wcs, name=f"w{e}"))
    ref = align_images(exposures=exps, fitgeom="shift", max_iterations=2,
                       usfac=4, fit_type="gaussian", cutout_shape=(16, 16),
                       min_sources=3)

    port = _free_port()
    coord = f"127.0.0.1:{port}"
    code = _ALIGN_WORKER.replace("__REPO__", os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", code, str(pid), coord],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so}\n{se}"
    line = next(ln for ln in outs[0][0].splitlines()
                if ln.startswith("RESULT "))
    got = json.loads(line[len("RESULT "):])
    assert got["n_iterations"] == ref.n_iterations
    np.testing.assert_allclose(got["shifts"], np.asarray(ref.shifts),
                               atol=5e-4)


_SPATIAL_WORKER = r"""
import json, os, sys
sys.path.insert(0, "__REPO__")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()
# tiny fetch chunks: the multi-host gather must take its CHUNKED
# allgather path (the bounded-HBM branch real mosaics rely on)
os.environ["SUBPIXAL_TPU_FETCH_CHUNK_BYTES"] = "8192"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from subpixal_tpu.parallel import init_distributed, make_global_mesh

pid = int(sys.argv[1])
assert init_distributed(coordinator_address=sys.argv[2],
                        num_processes=2, process_id=pid)

import numpy as np
from subpixal_tpu.align import align_images
from subpixal_tpu.resample import Drizzle, Exposure
from subpixal_tpu.wcs.wcs import TanWCS

# identical deterministic scene on every host
rng = np.random.default_rng(21)
E, shape, ns = 2, (96, 96), 6
cd = (0.05 / 3600.0) * np.array([[-1.0, 0.0], [0.0, 1.0]])
stars = rng.uniform(18, shape[1] - 18, (ns, 2))
yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float32)
exps = []
for e in range(E):
    dx, dy = rng.uniform(-0.3, 0.3, 2)
    img = rng.normal(0, 0.01, shape).astype(np.float32)
    for sx, sy in stars:
        r2 = (xx - sx - dx) ** 2 + (yy - sy - dy) ** 2
        img += np.where(r2 < 36.0, 20.0 * np.exp(-r2 / (2 * 1.5 ** 2)),
                        0.0).astype(np.float32)
    wcs = TanWCS(crpix=np.array([shape[1] / 2, shape[0] / 2]),
                 crval=np.array([150.0, 2.0]), cd=cd)
    exps.append(Exposure(img, wcs, name=f"w{e}"))

mesh = make_global_mesh()           # 4 devices: 2 procs x 2 local
assert mesh.devices.size == 4, mesh
d = Drizzle(exps, spatial_mesh=mesh)  # reference plane in 4 row bands
res = align_images(resample=d, fitgeom="shift", max_iterations=2,
                   usfac=4, fit_type="gaussian", cutout_shape=(16, 16),
                   min_sources=3)
if pid == 0:
    print("RESULT " + json.dumps({
        "shifts": np.asarray(res.shifts).tolist(),
        "n_iterations": res.n_iterations,
    }), flush=True)
"""


def test_two_process_spatial_align_matches_single_process():
    """The SPATIAL align (reference plane row-band-sharded ACROSS
    PROCESSES — bands on other hosts reachable only via collectives)
    lands on the single-process fixed point: multi-host mosaics beyond
    one host's device memory."""
    import numpy as np

    from subpixal_tpu.align import align_images
    from subpixal_tpu.resample import Exposure
    from subpixal_tpu.wcs.wcs import TanWCS

    rng = np.random.default_rng(21)
    E, shape, ns = 2, (96, 96), 6
    cd = (0.05 / 3600.0) * np.array([[-1.0, 0.0], [0.0, 1.0]])
    stars = rng.uniform(18, shape[1] - 18, (ns, 2))
    yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float32)
    exps = []
    for e in range(E):
        dx, dy = rng.uniform(-0.3, 0.3, 2)
        img = rng.normal(0, 0.01, shape).astype(np.float32)
        for sx, sy in stars:
            r2 = (xx - sx - dx) ** 2 + (yy - sy - dy) ** 2
            img += np.where(r2 < 36.0,
                            20.0 * np.exp(-r2 / (2 * 1.5 ** 2)),
                            0.0).astype(np.float32)
        wcs = TanWCS(crpix=np.array([shape[1] / 2, shape[0] / 2]),
                     crval=np.array([150.0, 2.0]), cd=cd)
        exps.append(Exposure(img, wcs, name=f"w{e}"))
    ref = align_images(exposures=exps, fitgeom="shift", max_iterations=2,
                       usfac=4, fit_type="gaussian", cutout_shape=(16, 16),
                       min_sources=3)

    port = _free_port()
    coord = f"127.0.0.1:{port}"
    code = _SPATIAL_WORKER.replace("__REPO__", os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", code, str(pid), coord],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so}\n{se}"
    line = next(ln for ln in outs[0][0].splitlines()
                if ln.startswith("RESULT "))
    got = json.loads(line[len("RESULT "):])
    assert got["n_iterations"] == ref.n_iterations
    np.testing.assert_allclose(got["shifts"], np.asarray(ref.shifts),
                               atol=5e-4)
