#!/usr/bin/env python
"""Polynomial-multiplication benchmark sweeps + witness-mode comparison —
the analog of the reference's bench_naive / bench_karatsuba / bench_best
(/root/reference/src/regular_functions_utils.rs:591-634) and of
randpoints_witness_bench's witness-vs-line-arrangement comparison (:687-735).

Host-side (python-int Poly) timings mirror the reference's CPU benches; the
device column times the jitted NTT multiply at the same lengths.

Usage: python tools/bench_polymul.py [--device] [--witness-pts 256]
"""

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", action="store_true",
                    help="also time the jitted NTT multiply on the backend")
    ap.add_argument("--witness-pts", type=int, default=256)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    from halo2_liam_eagen_msm_tpu.fields import PALLAS, PALLAS_FP
    from halo2_liam_eagen_msm_tpu.ops.poly import Poly
    from halo2_liam_eagen_msm_tpu.utils import pyref

    spec = PALLAS_FP
    rng = random.Random(0xBE)

    def rand_poly(n):
        return Poly(spec, [rng.randrange(spec.p) for _ in range(n)])

    print("# host poly-mul sweeps (ms per multiply, reps averaged)")
    print("# deg      naive  karatsuba   dispatch")
    for deg in (8, 16, 32, 64, 128, 256, 512, 1000):
        a, b = rand_poly(deg + 1), rand_poly(deg + 1)
        ts = []
        for fn in (a.mul_naive, a.mul_karatsuba, a.__mul__):
            t0 = time.time()
            for _ in range(args.reps):
                fn(b)
            ts.append((time.time() - t0) / args.reps * 1e3)
        print(f"{deg:6d} {ts[0]:10.2f} {ts[1]:10.2f} {ts[2]:10.2f}")

    if args.device:
        import jax
        import jax.numpy as jnp
        import numpy as np
        from halo2_liam_eagen_msm_tpu.limbs import ints_to_mont_limbs
        from halo2_liam_eagen_msm_tpu.ops.poly import mul_fft

        print("# device NTT multiply (ms, jitted, best of 3)")
        for logn in (6, 8, 10, 12):
            n = 1 << logn
            a = jnp.asarray(np.random.default_rng(1).integers(
                0, 1 << 16, (n, 16), dtype=np.uint32))
            f = jax.jit(lambda x: mul_fft(spec, x, x))
            jax.block_until_ready(f(a))
            ts = []
            for _ in range(3):
                t0 = time.time()
                jax.block_until_ready(f(a))
                ts.append(time.time() - t0)
            print(f"# len {n:6d}: {min(ts)*1e3:8.2f} ms")

    # witness modes at --witness-pts points (reference :687-735 shape)
    npts = args.witness_pts
    curve = PALLAS
    pts = pyref.random_points(rng, curve, npts - 1)
    s = pyref.ec_msm([1] * (npts - 1), pts, curve)
    pts.append(pyref.ec_neg(s, curve))

    from halo2_liam_eagen_msm_tpu.divisor import (
        compute_divisor_witness_naive_host,
    )
    from halo2_liam_eagen_msm_tpu.utils.ref_divisor import divisor_witness_host

    t0 = time.time()
    wtns, out = divisor_witness_host(curve, pts)
    t_full = time.time() - t0
    assert out is None
    print(f"# host divisor witness  @{npts} pts: {t_full*1e3:9.1f} ms")

    t0 = time.time()
    arr = compute_divisor_witness_naive_host(curve, pts)
    t_naive = time.time() - t0
    print(f"# naive line arrangement @{npts} pts: {t_naive*1e3:9.1f} ms "
          f"({len(arr.pos)} pos / {len(arr.neg)} neg lines)")

    t0 = time.time()
    acc = None
    for p in pts:
        acc = pyref.ec_add(acc, p, curve)
    t_sum = time.time() - t0
    assert acc is None, "points must sum to the identity"
    print(f"# plain point sum        @{npts} pts: {t_sum*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
