#!/usr/bin/env python
"""A/B check on real TPU: best_multiexp with the MXU radix reorder vs the
classic sort+gather path must agree exactly (both are exact paths), and the
radix path's exception flag must stay clear for honest random inputs.

Usage: python tools/ab_radix_msm.py [--logn 17] [--window C]
"""

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=17)
    ap.add_argument("--window", type=int, default=None)
    ap.add_argument("--distinct", type=int, default=256)
    args = ap.parse_args()

    import jax

    import __graft_entry__ as _ge
    _c = _ge._host_cache_dir(); os.makedirs(_c, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _c)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np

    from halo2_liam_eagen_msm_tpu import config as cfg
    from halo2_liam_eagen_msm_tpu.fields import PALLAS
    from halo2_liam_eagen_msm_tpu.limbs import ints_to_mont_limbs
    from halo2_liam_eagen_msm_tpu.ops.ec import JPoint, ec
    from halo2_liam_eagen_msm_tpu.ops import msm
    from halo2_liam_eagen_msm_tpu.utils import pyref

    n = 1 << args.logn
    curve = PALLAS
    E = ec(curve)
    rng = random.Random(0xAB17)
    nprng = np.random.default_rng(0xAB17)

    base = pyref.random_points(rng, curve, args.distinct)
    reps = n // args.distinct
    xs = np.asarray(ints_to_mont_limbs([p[0] for p in base], curve.field))
    ys = np.asarray(ints_to_mont_limbs([p[1] for p in base], curve.field))
    px = jnp.asarray(np.tile(xs, (reps, 1)))
    py = jnp.asarray(np.tile(ys, (reps, 1)))
    pz = jnp.asarray(np.tile(ints_to_mont_limbs([1], curve.field), (n, 1)))
    pts = JPoint(px, py, pz)

    sc = nprng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    sc[:, 15] &= 0x3FFF
    scalars = jnp.asarray(sc)

    c = args.window or msm.pick_window(n)
    bits = curve.scalar_field.p.bit_length()

    def run(radix):
        cfg.RADIX_MSM = radix
        msm._best_multiexp_jit.clear_cache()
        t0 = time.time()
        r, exc = msm._best_multiexp_jit(curve, c, bits, 8, "fast", scalars, pts)
        rx = jax.device_get(r.x)
        compile_s = time.time() - t0
        t0 = time.time()
        r, exc = msm._best_multiexp_jit(curve, c, bits, 8, "fast", scalars, pts)
        ints = E.points_to_ints(JPoint(r.x[None], r.y[None], r.z[None]))[0]
        steady = time.time() - t0
        return ints, bool(jax.device_get(exc)), compile_s, steady

    r_radix, exc_radix, comp_r, t_r = run(True)
    r_classic, exc_classic, comp_c, t_c = run(False)
    print(f"radix:   exc={exc_radix} compile={comp_r:.1f}s steady={t_r:.3f}s")
    print(f"classic: exc={exc_classic} compile={comp_c:.1f}s steady={t_c:.3f}s")
    ok = (r_radix == r_classic) and not exc_radix and not exc_classic
    print("result equal:", r_radix == r_classic)
    print("OK" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
