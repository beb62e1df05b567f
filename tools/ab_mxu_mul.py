#!/usr/bin/env python
"""A/B: MXU Toeplitz-matmul constant multiply vs the VPU field paths.

Times, on the real chip, a Montgomery multiply of a (N, 16) batch by one
shared constant three ways —
  * ff.FF.mul with the constant broadcast (XLA VPU path)
  * pallas_ff.mont_mul with the constant broadcast (fused VPU kernel)
  * mxu_ff.mul_const (three bf16 Toeplitz matmuls on the MXU)
— plus the per-position variant mxu_ff.mul_table at an NTT-twiddle-stage
shape.  Decides whether the MXU path should back the NTT butterfly
multiplies (docs/MFU.md's "move field math onto the MXU" lever; VERDICT r4
item 3).  Writes one JSON line per measurement.

Usage: python tools/ab_mxu_mul.py [--logn 20]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench_util import timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=20)
    args = ap.parse_args()

    import random

    import jax

    import __graft_entry__ as _ge
    _c = _ge._host_cache_dir(); os.makedirs(_c, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _c)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from halo2_liam_eagen_msm_tpu.fields import PALLAS, N_LIMBS
    from halo2_liam_eagen_msm_tpu.limbs import ints_to_mont_limbs
    from halo2_liam_eagen_msm_tpu.ops import mxu_ff
    from halo2_liam_eagen_msm_tpu.ops.ff import ff
    from halo2_liam_eagen_msm_tpu.ops import pallas_ff

    spec = PALLAS.field
    k = ff(spec)
    rng = random.Random(0xAB)
    n = 1 << args.logn

    rnd = np.random.default_rng(3)
    a = jnp.asarray(rnd.integers(0, 1 << 16, size=(n, N_LIMBS),
                                 dtype=np.uint32))
    c_val = rng.randrange(spec.p)
    c_limbs = ints_to_mont_limbs([c_val], spec)[0]
    c_int = sum(int(v) << (16 * i) for i, v in enumerate(c_limbs))
    c_bcast = jnp.broadcast_to(jnp.asarray(c_limbs), a.shape)

    results = []

    def report(name, t):
        r = {"metric": f"mul_const_{name}_2^{args.logn}",
             "value": round(n / t / 1e6, 1), "unit": "Mmul/s",
             "seconds": round(t, 5)}
        results.append(r)
        print(json.dumps(r), flush=True)

    t, _ = timeit(lambda x: k.mul(x, c_bcast), a)
    report("vpu_xla", t)
    t, _ = timeit(lambda x: pallas_ff.mont_mul(spec, x, c_bcast), a)
    report("vpu_pallas", t)
    t, _ = timeit(lambda x: mxu_ff.mul_const(spec, x, c_int), a)
    report("mxu", t)

    # NTT-stage shape: (batch, n_pos, 16) with per-position constants
    n_pos = 1 << (args.logn // 2)
    batch = n // n_pos
    a2 = a.reshape(batch, n_pos, N_LIMBS)
    tvals = [rng.randrange(spec.p) for _ in range(n_pos)]
    table = np.asarray(ints_to_mont_limbs(tvals, spec))
    tb = jnp.asarray(table)
    t, _ = timeit(lambda x: k.mul(x, jnp.broadcast_to(tb, x.shape)), a2)
    report(f"table_vpu_xla_pos{n_pos}", t)
    t, _ = timeit(lambda x: mxu_ff.mul_table(spec, x, table), a2)
    report(f"table_mxu_pos{n_pos}", t)

    # correctness spot check on device data
    want = np.asarray(k.mul(a[:64], c_bcast[:64]))
    got = np.asarray(mxu_ff.mul_const(spec, a[:64], c_int))
    assert np.array_equal(want, got), "MXU path disagrees with VPU path"
    print("# exactness spot-check OK", flush=True)


if __name__ == "__main__":
    main()
