#!/usr/bin/env python
"""Time ONE divisor merge level at an arbitrary (population, length) shape.

The fused merge's runtime is data-independent (fixed op schedule; the
exact-fallback lax.cond only fires on degenerate/torsion/zero-den inputs,
which random distinct points never hit), so a level can be timed with
SYNTHETIC inputs: random coefficients and random distinct output points.
This scans the 2^20 round's level inventory in a handful of compiles
instead of recompiling the whole 21-level tree (tools/profile_round_levels
does the honest full-round version; the two agree at 2^18 shapes).

Usage: python tools/probe_level.py --m 2 --la 524289
       python tools/probe_level.py --sweep 20     # the 2^20 round's levels
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(curve, m, la, lb, reps=3):
    import jax
    import jax.numpy as jnp

    from halo2_liam_eagen_msm_tpu import divisor as D
    from halo2_liam_eagen_msm_tpu.ops.ec import JPoint, ec
    from halo2_liam_eagen_msm_tpu.utils import pyref

    E = ec(curve)
    import random
    rng = random.Random(0x9E + m)
    rnd = np.random.default_rng(m * 1000 + la % 997)

    # random distinct outputs (no degenerate lines / torsion / bypass)
    from halo2_liam_eagen_msm_tpu.limbs import ints_to_mont_limbs
    pts_ints = pyref.random_points(rng, curve, min(m, 64))
    reps_pts = -(-m // len(pts_ints))
    # tile then nudge: distinctness only matters for ADJACENT pairs, and
    # 64 distinct points tiled in order never pair equal neighbors
    xs = np.tile(np.asarray(ints_to_mont_limbs([p[0] for p in pts_ints],
                                               curve.field)), (reps_pts, 1))[:m]
    ys = np.tile(np.asarray(ints_to_mont_limbs([p[1] for p in pts_ints],
                                               curve.field)), (reps_pts, 1))[:m]
    ones = np.tile(np.asarray(ints_to_mont_limbs([1], curve.field)), (m, 1))
    out = JPoint(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ones))

    wa = jnp.asarray(rnd.integers(0, 1 << 16, size=(m, la, 16), dtype=np.uint32))
    wb = jnp.asarray(rnd.integers(0, 1 << 16, size=(m, lb, 16), dtype=np.uint32))
    lv = D.Level(out, D.RF(wa, wb))

    fused = la >= D.FUSE_MIN_LA
    consts = (D._fused_consts_dev(curve, D.fused_logn(la, lb))
              if fused else None)

    # IMPORTANT (axon): block_until_ready is a no-op over the tunnel — only
    # a device_get of real bytes synchronizes.  The level is wrapped with an
    # in-graph checksum whose scalar is fetched per repetition, and each
    # repetition's input is perturbed so no layer can serve a cached result.
    # consts MUST be an argument, not a closure: closed-over device arrays
    # lower as HLO constants and the tunnel rejects >100 MB payloads (413).
    @jax.jit
    def run_cs(l, consts):
        # production sems for inputs (la, lb) = (bs+1, bs): (2bs+1, 2bs)
        nxt = D.merge_level(curve, la + lb, la + lb - 1, l, consts)
        return (jnp.sum(nxt.wtns.a, dtype=jnp.uint32)
                + jnp.sum(nxt.wtns.b, dtype=jnp.uint32))

    def bump(l, i):
        return D.Level(l.out, D.RF(l.wtns.a + np.uint32(i), l.wtns.b))

    t0 = time.time()
    cs = jax.device_get(run_cs(lv, consts))
    t_first = time.time() - t0
    ts = []
    for i in range(reps):
        lvi = bump(lv, i + 1)
        jax.device_get(jnp.sum(lvi.wtns.a[0, 0], dtype=jnp.uint32))  # sync prep
        t0 = time.time()
        cs = jax.device_get(run_cs(lvi, consts))
        ts.append(time.time() - t0)
    n_ntt = (1 << D.fused_logn(la, lb)) if fused else 0
    return {
        "m": m, "la": la, "lb": lb,
        "path": "fused" if fused else "coeff", "ntt_n": n_ntt,
        "elems_mxn": (m // 2) * n_ntt,
        "first_s": round(t_first, 2), "steady_s": round(min(ts), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=None)
    ap.add_argument("--la", type=int, default=None)
    ap.add_argument("--lb", type=int, default=None)
    ap.add_argument("--sweep", type=int, default=None,
                    help="probe the top fused levels of a 2^logn round")
    ap.add_argument("--levels", type=int, default=8,
                    help="how many top levels to sweep")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    import __graft_entry__ as _ge
    _c = _ge._host_cache_dir(); os.makedirs(_c, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _c)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from halo2_liam_eagen_msm_tpu.fields import PALLAS

    curve = PALLAS
    if args.sweep:
        # level inventory of a (2^logn + base + 1)-slot round, base 5:
        # populations m_k ~ S/2^k (odd tails), lengths la = 2^k + 1
        s = (1 << args.sweep) + 6
        rows = []
        ms, bs = [], 1
        m = s // 2
        while m > 1:
            ms.append(m)
            m = (m + 1) // 2
        ms.append(1)  # not a level input; populations after each level
        levels = []
        pop = s // 2
        bsem = 1
        while pop > 1:
            la, lb = bsem + 1, bsem
            levels.append((pop, la, lb))
            pop = (pop + 1) // 2
            bsem *= 2
        for (pop, la, lb) in levels[-args.levels:]:
            r = probe(curve, pop if pop % 2 == 0 else pop - 1, la, lb,
                      args.reps)
            print(json.dumps(r), flush=True)
            rows.append(r)
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           f"probe_levels_2^{args.sweep}.json")
        with open(out, "w") as f:
            json.dump(rows, f, indent=1)
    else:
        r = probe(curve, args.m, args.la, args.lb or args.la - 1, args.reps)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
