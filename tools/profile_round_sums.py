#!/usr/bin/env python
"""Profile the argument carries stage (ops/msm.round_sums) on real TPU.

Breaks the 56-round digit-sum computation into stages to find where the
time goes (VERDICT r3 weak #1: 289s at 2^18 vs an 83ms claim at 2^16).

Usage: python tools/profile_round_sums.py [--logn 18] [--base 5]
"""

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(label, fn, *a, **k):
    t0 = time.time()
    r = fn(*a, **k)
    import jax
    jax.block_until_ready(r)
    first = time.time() - t0
    t0 = time.time()
    r = fn(*a, **k)
    jax.block_until_ready(r)
    steady = time.time() - t0
    print(f"{label:40s} first={first:8.2f}s steady={steady:8.3f}s", flush=True)
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=18)
    ap.add_argument("--base", type=int, default=5)
    args = ap.parse_args()

    import jax

    import __graft_entry__ as _ge
    _c = _ge._host_cache_dir(); os.makedirs(_c, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _c)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np

    from halo2_liam_eagen_msm_tpu import argument as A
    from halo2_liam_eagen_msm_tpu.fields import PALLAS
    from halo2_liam_eagen_msm_tpu.limbs import ints_to_limbs, ints_to_mont_limbs
    from halo2_liam_eagen_msm_tpu.negbase import negbase_decompose_batch
    from halo2_liam_eagen_msm_tpu.ops.ec import JPoint, ec
    from halo2_liam_eagen_msm_tpu.ops import msm
    from halo2_liam_eagen_msm_tpu.utils import pyref

    n = 1 << args.logn
    base = args.base
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
    print(f"# device={jax.devices()[0]} n=2^{args.logn} base={base} d={d}")

    # stage 0: full fast-flavor round_sums (what _carries_only calls)
    sums, exc = t("round_sums fast (all rounds)",
                  lambda: msm._round_sums_jit(curve, base, "fast",
                                              digits_msb, pts))
    print("  exc_any =", bool(jax.device_get(exc)))

    # stage 1: one round only
    s1 = t("round_sums fast (1 round)",
           lambda: msm._round_sums_jit(curve, base, "fast",
                                       digits_msb[:1], pts))
    print("  exc(1) =", bool(jax.device_get(s1[1])))

    # stage 2: 8 rounds
    t("round_sums fast (8 rounds)",
      lambda: msm._round_sums_jit(curve, base, "fast", digits_msb[:8], pts))

    # per-round exception flags (which rounds flag?)
    c = max(1, (base - 1).bit_length())
    ax, ay, _ = jax.jit(lambda p: E.to_affine(p))(pts)
    pay = jax.jit(msm._pack_pair)(ax, ay)
    ow = msm._make_one_window(E, c, "fast", pay, n)
    outs = jax.jit(lambda dg: jax.lax.map(ow, dg))(digits_msb)
    excs = np.asarray(jax.device_get(outs[1]))
    print("per-round exc flags:", excs.astype(int).tolist())

    # stage 3: to_affine alone
    t("to_affine", jax.jit(lambda p: E.to_affine(p)), pts)


if __name__ == "__main__":
    main()
