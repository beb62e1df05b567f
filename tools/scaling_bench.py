#!/usr/bin/env python
"""Scaling-efficiency harness (BASELINE configs 4-5): times the sharded MSM
on meshes of 1..N devices and reports efficiency vs 1-device speed.

On real multi-chip hardware this measures ICI scaling; on the virtual CPU
mesh (--cpu) it validates the sharded program end-to-end and reports the
(virtual) efficiency of the same code path.

Usage:
  python tools/scaling_bench.py --logn 16 --devices 1 2 4 8 [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=14)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(args.devices)}"
        ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import sys as _sys
    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as _ge
    _c = _ge._host_cache_dir(); os.makedirs(_c, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _c)

    import numpy as np
    import jax.numpy as jnp

    from halo2_liam_eagen_msm_tpu.fields import PALLAS
    from halo2_liam_eagen_msm_tpu.limbs import ints_to_mont_limbs
    from halo2_liam_eagen_msm_tpu.ops.ec import JPoint, ec
    from halo2_liam_eagen_msm_tpu.parallel.mesh import make_mesh, sharded_msm
    from halo2_liam_eagen_msm_tpu.utils import pyref

    import random

    rng = random.Random(0x5CA1E)
    n = 1 << args.logn
    E = ec(PALLAS)
    base = pyref.random_points(rng, PALLAS, 64)
    xs = np.asarray(ints_to_mont_limbs([p[0] for p in base], PALLAS.field))
    ys = np.asarray(ints_to_mont_limbs([p[1] for p in base], PALLAS.field))
    px = jnp.asarray(np.tile(xs, (n // 64, 1)))
    py = jnp.asarray(np.tile(ys, (n // 64, 1)))
    pz = jnp.asarray(np.tile(ints_to_mont_limbs([1], PALLAS.field), (n, 1)))
    pts = JPoint(px, py, pz)
    scm = np.random.default_rng(1).integers(0, 1 << 16, (n, 16), dtype=np.uint32)
    scm[:, 15] &= 0x3FFF
    sc = jnp.asarray(scm)

    results = {}
    for d in args.devices:
        if d > len(jax.devices()):
            print(f"# skipping {d} devices (only {len(jax.devices())})", file=sys.stderr)
            continue
        mesh = make_mesh(d)
        f = lambda: sharded_msm(PALLAS, sc, pts, mesh, c=args.window)
        r = f()
        jax.device_get(r.x)  # compile+sync
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            r = f()
            jax.device_get(r.x)
            times.append(time.time() - t0)
        results[d] = min(times)
        print(f"# {d} devices: {results[d]:.3f}s", file=sys.stderr)

    if 1 in results:
        base_t = results[1]
        for d, t in sorted(results.items()):
            eff = base_t / (t * d)
            print(json.dumps({
                "metric": f"msm_scaling_eff_2^{args.logn}",
                "devices": d,
                "seconds": round(t, 4),
                "efficiency": round(eff, 4),
            }))


if __name__ == "__main__":
    main()
