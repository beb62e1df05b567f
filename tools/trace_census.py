#!/usr/bin/env python
"""Census of pallas kernel-body traces during jax lowering of the MSM.

docs/DESIGN-compile-time.md: 85% of the 2^20 MSM "compile" is jax TRACING,
driven by the number of distinct (kernel, shape) pallas_call instantiations
(each re-traces a ~30k-equation unrolled Montgomery body).  This tool counts
them exactly: every `pl.pallas_call(...)(...)` executed while `jit.lower()`
runs is one kernel-body trace (jit-cached wrapper calls don't re-execute).

Runs on CPU (tracing is shape-only), with the pallas routing forced on so
the traced graph is the TPU graph.

Usage: python tools/trace_census.py [--logn 18] [--window C] [--flavor fast]
"""

import argparse
import collections
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=18)
    ap.add_argument("--window", type=int, default=None)
    ap.add_argument("--flavor", default="fast", choices=["fast", "safe", "cond"])
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from jax.experimental import pallas as pl
    import halo2_liam_eagen_msm_tpu.config as cfg
    cfg.set_use_pallas(True)

    census = collections.Counter()
    orig = pl.pallas_call

    def counting_pallas_call(kern, *a, **kw):
        inner = orig(kern, *a, **kw)

        def wrapped(*ops):
            name = getattr(kern, "__name__", str(kern))
            shapes = tuple(tuple(getattr(o, "shape", ())) for o in ops)
            census[(name, shapes)] += 1
            return inner(*ops)

        return wrapped

    # patch at the module the wrappers resolve `pl` through
    from halo2_liam_eagen_msm_tpu.ops import pallas_ff as PF
    PF.pl.pallas_call = counting_pallas_call

    from halo2_liam_eagen_msm_tpu.fields import PALLAS
    from halo2_liam_eagen_msm_tpu.ops import msm as M
    from halo2_liam_eagen_msm_tpu.ops.ec import ec

    n = 1 << args.logn
    c = args.window or M.pick_window(n)
    bits = 254
    E = ec(PALLAS)
    scal = jax.ShapeDtypeStruct((n, 16), np.uint32)
    pt = jax.ShapeDtypeStruct((n, 16), np.uint32)
    pts = M.JPoint(pt, pt, pt)
    wb = max(1, min(-(-bits // c), (1 << 24) // n or 1, 8))

    t0 = time.time()
    lowered = M._best_multiexp_jit.lower(PALLAS, c, bits, wb, args.flavor,
                                         scal, pts)
    t1 = time.time()
    txt_len = len(lowered.as_text())

    total = sum(census.values())
    uniq = len(census)
    by_kern = collections.Counter()
    for (name, shapes), k in census.items():
        by_kern[name] += k
    print(f"# lower time {t1 - t0:.1f}s  stablehlo {txt_len/1e6:.1f} MB  "
          f"n=2^{args.logn} c={c} flavor={args.flavor}")
    print(f"# kernel-body traces: {total} total, {uniq} unique (kernel, shape)")
    for name, k in by_kern.most_common():
        print(f"  {k:4d}  {name}")
    print("# unique shapes per kernel:")
    for (name, shapes), k in sorted(census.items()):
        print(f"  {k:3d}x {name} {shapes}")


if __name__ == "__main__":
    main()
