#!/usr/bin/env python
"""Per-level timing of ONE production argument round on the real TPU.

bench_argument measured the 2^20 divisor round at 13.27 s vs 1.47 s at
2^18 — 9x the time for 4x the points where the tree's O(N log^2 N) predicts
~4.4x.  This tool reproduces bench_argument's EXACT round construction
(64 distinct points tiled, random scalars, `_one_round_slots`, so the level
shapes and compile-cache entries match the production path) and times every
merge level separately: first call (compile-inclusive) and steady state,
plus the level's array shapes — the data needed to locate the superlinear
factor (HBM pressure at top levels, per-level dispatch, fused-merge
internals).  Reference analog: the per-digit divisor computation inside
the loop at /root/reference/src/argument_witness_calc.rs:108-130.

Usage: python tools/profile_round_levels.py [--logn 18] [--base 5]
       [--round 1] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=18)
    ap.add_argument("--base", type=int, default=5)
    ap.add_argument("--round", type=int, default=1,
                    help="which digit round to profile (0 is the all-zero "
                         "spare top round — not representative)")
    ap.add_argument("--reps", type=int, default=3,
                    help="steady-state repetitions per level")
    ap.add_argument("--distinct", type=int, default=64)
    args = ap.parse_args()

    import random

    import jax

    import __graft_entry__ as _ge
    _c = _ge._host_cache_dir(); os.makedirs(_c, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _c)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from halo2_liam_eagen_msm_tpu import argument as A
    from halo2_liam_eagen_msm_tpu import divisor as D
    from halo2_liam_eagen_msm_tpu.fields import PALLAS
    from halo2_liam_eagen_msm_tpu.limbs import ints_to_limbs, ints_to_mont_limbs
    from halo2_liam_eagen_msm_tpu.negbase import negbase_decompose_batch
    from halo2_liam_eagen_msm_tpu.ops.ec import JPoint, ec
    from halo2_liam_eagen_msm_tpu.utils import pyref

    n = 1 << args.logn
    base = args.base
    curve = PALLAS
    E = ec(curve)
    rng = random.Random(0xA26)  # bench_argument's seed: identical data

    distinct = args.distinct
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

    dev = jax.devices()[0]
    print(f"# device={dev}, n=2^{args.logn}, base={base}, "
          f"round {args.round}/{d}", flush=True)

    t0 = time.time()
    carry_prev, carry_new, final = A._carries_only(curve, base, digits_msb, pts)
    precomp = jax.jit(lambda p: A.precompute_multiplicities(E, p, base))(pts)
    jax.block_until_ready(final.x)
    print(f"# carries+multiplicities: {time.time()-t0:.1f}s", flush=True)

    k = args.round
    rp = A._one_round_slots(
        curve, base, digits_msb[k], precomp,
        JPoint(carry_prev.x[k], carry_prev.y[k], carry_prev.z[k]),
        JPoint(carry_new.x[k], carry_new.y[k], carry_new.z[k]))
    jax.block_until_ready(rp.x)

    # identity-pad odd lists exactly like compute_divisor_witness_partial
    s = rp.x.shape[-2]
    if s % 2:
        idp = E.identity((1,))
        rp = JPoint(jnp.concatenate([rp.x, idp.x], axis=-2),
                    jnp.concatenate([rp.y, idp.y], axis=-2),
                    jnp.concatenate([rp.z, idp.z], axis=-2))

    def timed(fn, *a):
        """First-call + steady timing with REAL synchronization: on the
        axon tunnel block_until_ready is a no-op, so each repetition
        device_gets an in-graph checksum of the output (and perturbs the
        input so no layer can serve a cached result)."""
        csfn = jax.jit(lambda *aa: sum(
            jnp.sum(l, dtype=jnp.uint32)
            for l in jax.tree_util.tree_leaves(fn(*aa))
            if hasattr(l, "dtype")))
        t0 = time.time()
        jax.device_get(csfn(*a))
        t_first = time.time() - t0
        ts = []
        for i in range(args.reps):
            a_i = (jax.tree_util.tree_map(
                lambda l: l + np.uint32(i + 1) if l.dtype == jnp.uint32
                else l, a[0]),) + a[1:]
            jax.device_get(jnp.sum(jax.tree_util.tree_leaves(a_i)[0],
                                   dtype=jnp.uint32))  # sync prep
            t0 = time.time()
            jax.device_get(csfn(*a_i))
            ts.append(time.time() - t0)
        out = fn(*a)  # chain input for the next level (after timing)
        return t_first, min(ts), out

    rows = []
    t_first, t_steady, lv = timed(lambda p: D._seeds_jit(curve, p), rp)
    print(f"seeds    S={rp.x.shape[-2]:8d}:"
          f" first {t_first:7.2f}s steady {t_steady*1e3:9.1f} ms", flush=True)
    rows.append({"level": "seeds", "m": int(rp.x.shape[-2]) // 2,
                 "first_s": round(t_first, 3),
                 "steady_s": round(t_steady, 4)})

    total = t_steady
    b_sem = 1
    while lv.out.x.shape[-2] > 1:
        b_sem *= 2
        m = lv.out.x.shape[-2]
        la, lb = lv.wtns.a.shape[-2], lv.wtns.b.shape[-2]
        fused = la >= D.FUSE_MIN_LA
        consts = (D._fused_consts_dev(curve, D.fused_logn(la, lb))
                  if fused else None)
        logn_lvl = D.fused_logn(la, lb) if fused else 0
        bs = b_sem
        t_first, t_steady, lv = timed(
            lambda l: D._merge_level_jit(curve, bs + 1, bs, l, consts), lv)
        total += t_steady
        mem = dev.memory_stats() or {}
        rows.append({
            "level": f"M={m}", "m": int(m), "la": int(la), "lb": int(lb),
            "path": "fused" if fused else "coeff",
            "ntt_n": (1 << logn_lvl) if fused else 0,
            "rows_mxn": int(m // 2) * (1 << logn_lvl) if fused else 0,
            "first_s": round(t_first, 3),
            "steady_s": round(t_steady, 4),
            "peak_hbm_gb": round(mem.get("peak_bytes_in_use", 0) / 2**30, 2),
        })
        print(f"level M={m:8d} La={la:8d} "
              f"[{'fused n=2^%d' % logn_lvl if fused else 'coeff'}]:"
              f" first {t_first:7.2f}s steady {t_steady*1e3:9.1f} ms"
              f" peak_hbm {rows[-1]['peak_hbm_gb']:.1f} GB", flush=True)

    ok = bool(jax.device_get(E.is_identity(JPoint(
        lv.out.x[..., 0, :], lv.out.y[..., 0, :], lv.out.z[..., 0, :]))))
    print(f"--- sum of steady levels: {total:8.2f}s "
          f"({n/total:.0f} pts/s); round closes: {ok}", flush=True)

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        f"profile_round_levels_2^{args.logn}.json")
    with open(out_path, "w") as f:
        json.dump({"logn": args.logn, "base": base, "round": k,
                   "steady_total_s": round(total, 3), "levels": rows}, f,
                  indent=1)
    print(f"# wrote {os.path.normpath(out_path)}", flush=True)


if __name__ == "__main__":
    main()
