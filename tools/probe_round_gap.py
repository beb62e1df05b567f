#!/usr/bin/env python
"""Locate the gap between per-level steadies (~4.5 s) and the bench's
20.3 s/round at 2^20: run the EXACT bench round (same jitted executables,
warm persistent cache) back-to-back vs with drain pauses, and with the
parts timed separately.  Hypothesis: the tunnel's deferred deallocations
stall back-to-back rounds (each round allocates ~GBs of transients).

Usage: python tools/probe_round_gap.py [--logn 20] [--n-runs 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=20)
    ap.add_argument("--n-runs", type=int, default=4)
    ap.add_argument("--pause", type=float, default=20.0)
    args = ap.parse_args()

    import random

    import jax

    import __graft_entry__ as _ge
    _c = _ge._host_cache_dir(); os.makedirs(_c, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _c)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from halo2_liam_eagen_msm_tpu import argument as A
    from halo2_liam_eagen_msm_tpu.divisor import compute_divisor_witness_partial
    from halo2_liam_eagen_msm_tpu.fields import PALLAS
    from halo2_liam_eagen_msm_tpu.limbs import ints_to_limbs, ints_to_mont_limbs
    from halo2_liam_eagen_msm_tpu.negbase import negbase_decompose_batch
    from halo2_liam_eagen_msm_tpu.ops.ec import JPoint, ec
    from halo2_liam_eagen_msm_tpu.utils import pyref

    n = 1 << args.logn
    base = 5
    curve = PALLAS
    E = ec(curve)
    rng = random.Random(0xA26)

    distinct = 64
    bpts = pyref.random_points(rng, curve, distinct)
    xs = np.asarray(ints_to_mont_limbs([p[0] for p in bpts], curve.field))
    ys = np.asarray(ints_to_mont_limbs([p[1] for p in bpts], curve.field))
    reps = n // distinct
    pts = JPoint(
        jnp.asarray(np.tile(xs, (reps, 1))),
        jnp.asarray(np.tile(ys, (reps, 1))),
        jnp.asarray(np.tile(ints_to_mont_limbs([1], curve.field), (n, 1))),
    )
    scalars = [A.gen_random_coeff(rng, curve.scalar_field) for _ in range(n)]
    d = A.num_digits_for(curve, base)
    digits = negbase_decompose_batch(ints_to_limbs(scalars), base, d)
    digits_msb = jnp.asarray(digits[:, ::-1].T.astype(np.int32))

    t0 = time.time()
    carry_prev, carry_new, final = A._carries_only(curve, base, digits_msb, pts)
    precomp = jax.jit(lambda p: A.precompute_multiplicities(E, p, base))(pts)
    jax.device_get(jnp.sum(final.x, dtype=jnp.uint32))
    print(f"# carries ready: {time.time()-t0:.1f}s", flush=True)

    def slots(k):
        return A._one_round_slots(
            curve, base, digits_msb[k], precomp,
            JPoint(carry_prev.x[k], carry_prev.y[k], carry_prev.z[k]),
            JPoint(carry_new.x[k], carry_new.y[k], carry_new.z[k]))

    def witness(rp):
        wtns, out = compute_divisor_witness_partial(curve, rp)
        return (jnp.sum(wtns.a, dtype=jnp.uint32)
                + jnp.sum(wtns.b, dtype=jnp.uint32))

    # warm (compile everything once)
    t0 = time.time()
    rp = slots(1)
    jax.device_get(jnp.sum(rp.x, dtype=jnp.uint32))
    t_slots_first = time.time() - t0
    t0 = time.time()
    jax.device_get(witness(rp))
    print(f"# first slots {t_slots_first:.1f}s, first witness "
          f"{time.time()-t0:.1f}s (compile-inclusive)", flush=True)

    # A) slots alone, steady
    for k in (2, 3):
        t0 = time.time()
        rp = slots(k)
        jax.device_get(jnp.sum(rp.x, dtype=jnp.uint32))
        print(f"# slots round {k}: {time.time()-t0:.2f}s", flush=True)

    # B) witness alone on the SAME rp, back-to-back
    for i in range(args.n_runs):
        t0 = time.time()
        jax.device_get(witness(rp))
        print(f"# witness b2b {i}: {time.time()-t0:.2f}s", flush=True)

    # C) witness with a drain pause before each run
    for i in range(2):
        time.sleep(args.pause)
        t0 = time.time()
        jax.device_get(witness(rp))
        print(f"# witness after {args.pause:.0f}s pause: "
              f"{time.time()-t0:.2f}s", flush=True)

    # D) the full bench round (slots + witness), back-to-back
    for k in range(4, 4 + args.n_runs):
        t0 = time.time()
        cs = witness(slots(k))
        jax.device_get(cs)
        print(f"# full round {k}: {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
