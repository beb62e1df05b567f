#!/usr/bin/env python
"""Per-level timing of the divisor-witness merge tree on real TPU.

The divisor engine runs log2(n) level-synchronous merge rounds; this tool
times each level separately (amortized against the axon dispatch floor),
plus the NTT / batch-inversion primitives at the sizes the top levels use —
the data that directs optimization (VERDICT r2 item 4).

Usage: python tools/profile_divisor.py [--logn 16]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench_util import timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=16)
    args = ap.parse_args()

    import random

    import jax

    import __graft_entry__ as _ge
    _c = _ge._host_cache_dir(); os.makedirs(_c, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _c)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from halo2_liam_eagen_msm_tpu import divisor as D
    from halo2_liam_eagen_msm_tpu.fields import PALLAS
    from halo2_liam_eagen_msm_tpu.ops.ec import JPoint, ec
    from halo2_liam_eagen_msm_tpu.ops.ff import ff
    from halo2_liam_eagen_msm_tpu.ops.ntt import ntt_dif, intt_dit
    from halo2_liam_eagen_msm_tpu.utils import pyref

    n = 1 << args.logn
    curve = PALLAS
    E = ec(curve)
    rng = random.Random(0xD1)

    m = 128
    base = pyref.random_points(rng, curve, m)
    neg = [pyref.ec_neg(p, curve) for p in base]
    pts_ints = (base * (n // (2 * m))) + (neg * (n // (2 * m)))
    pts = E.points_from_ints(pts_ints)

    t, lv = timeit(lambda p: D._seeds_jit(curve, p), pts)
    print(f"seeds ({n} pts):            {t*1e3:8.1f} ms")

    total = t
    b_sem = 1
    while lv.out.x.shape[-2] > 1:
        b_sem *= 2
        mcount = lv.out.x.shape[-2]
        la = lv.wtns.a.shape[-2]
        t, nxt = timeit(
            lambda l: D._merge_level_jit(curve, b_sem + 1, b_sem, l), lv
        )
        total += t
        path = "fused" if la >= D.FUSE_MIN_LA else "coeff"
        print(f"level M={mcount:6d} La={la:6d} [{path}]: {t*1e3:8.1f} ms")
        lv = nxt

    print(f"--- sum of levels:          {total*1e3:8.1f} ms "
          f"({n/total:.0f} pts/s)")

    # primitives at the top-level sizes
    spec = curve.field
    k = ff(spec)
    for logm in (args.logn - 2, args.logn - 1, args.logn):
        mm = 1 << logm
        batch = max(1, n // mm // 2)
        arr = jnp.asarray(
            np.random.default_rng(1).integers(0, 1 << 16,
                                              size=(batch, mm, 16),
                                              dtype=np.uint32))
        t, _ = timeit(lambda a: ntt_dif(spec, a), arr)
        print(f"ntt_dif   (batch {batch:4d} x 2^{logm}): {t*1e3:8.1f} ms")
        t, _ = timeit(lambda a: intt_dit(spec, a), arr)
        print(f"intt_dit  (batch {batch:4d} x 2^{logm}): {t*1e3:8.1f} ms")
        t, _ = timeit(lambda a: k.batch_inv(a, axis=-2), arr)
        print(f"batch_inv (batch {batch:4d} x 2^{logm}): {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
