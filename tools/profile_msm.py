#!/usr/bin/env python
"""Component-level timing of the TPU Pippenger MSM at a given size.

Times, per window: key sort, sorted-prefix scan (the dominant EC work),
bucket boundary queries, bucket triangle reduction, and the window fold —
each as a separately jitted stage on the real chip, to direct optimization.

Usage: python tools/profile_msm.py [--logn 20] [--window 15]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=3, inner=4):
    """Amortized on-device stage timing: runs fn `inner` times and once in
    single jit dispatches and reports (t_inner - t_1)/(inner - 1) plus the
    once-output — the ~25 ms axon tunnel dispatch floor cancels out.  Each
    inner repetition's first arg is perturbed by the running checksum's
    parity so XLA cannot CSE the repetitions."""
    import jax
    import jax.numpy as jnp

    def cs_of(out):
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.uint32)) for l in leaves
                   if hasattr(l, "shape"))

    @jax.jit
    def once(*a):
        out = fn(*a)
        return out, cs_of(out)

    @jax.jit
    def many(*a):
        acc = jnp.zeros((), jnp.uint32)
        for _ in range(inner):
            first = a[0]
            bump = jax.tree_util.tree_map(
                lambda l: l + (acc & 1).astype(l.dtype), first)
            acc = acc + cs_of(fn(bump, *a[1:]))
        return acc

    out, cs = once(*args)
    jax.device_get(cs)
    jax.device_get(many(*args))

    def best(f):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            r = f(*args)
            jax.device_get(r[1] if isinstance(r, tuple) else r)
            ts.append(time.time() - t0)
        return min(ts)

    t1 = best(once)
    tn = best(many)
    return max((tn - t1) / (inner - 1), 0.0), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=20)
    ap.add_argument("--window", type=int, default=None)
    args = ap.parse_args()

    import random

    import jax

    import __graft_entry__ as _ge
    _c = _ge._host_cache_dir(); __import__("os").makedirs(_c, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _c)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from functools import partial

    from halo2_liam_eagen_msm_tpu.fields import PALLAS
    from halo2_liam_eagen_msm_tpu.limbs import ints_to_mont_limbs
    from halo2_liam_eagen_msm_tpu.ops.ec import JPoint, ec
    from halo2_liam_eagen_msm_tpu.ops import msm as M
    from halo2_liam_eagen_msm_tpu.utils import pyref

    n = 1 << args.logn
    curve = PALLAS
    E = ec(curve)
    c = args.window or M.pick_window(n)
    rng = random.Random(0xBE7C)
    nprng = np.random.default_rng(0xBE7C)

    base = pyref.random_points(rng, curve, 64)
    reps = n // 64
    xs = np.asarray(ints_to_mont_limbs([p[0] for p in base], curve.field))
    ys = np.asarray(ints_to_mont_limbs([p[1] for p in base], curve.field))
    px = jnp.asarray(np.tile(xs, (reps, 1)))
    py = jnp.asarray(np.tile(ys, (reps, 1)))
    pz = jnp.asarray(np.tile(ints_to_mont_limbs([1], curve.field), (n, 1)))
    pts = JPoint(px, py, pz)
    sc = nprng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    sc[:, 15] &= 0x3FFF
    scalars = jnp.asarray(sc)

    @jax.jit
    def stage_affine(p):
        return E.to_affine(p)

    t_aff, (ax, ay, aid) = timeit(stage_affine, pts)
    print(f"to_affine (once):        {t_aff * 1e3:8.1f} ms")

    digits = jax.jit(partial(M.window_digits, c=c, num_windows=1))(scalars)[0]

    @jax.jit
    def stage_sort(keys):
        return jax.lax.sort_key_val(keys, jnp.arange(n, dtype=jnp.int32))

    t_sort, (keys, order) = timeit(stage_sort, digits)
    print(f"sort_key_val:            {t_sort * 1e3:8.1f} ms/window")

    from halo2_liam_eagen_msm_tpu.ops.msm import _pack_pair, _unpack_pair
    pay = jax.jit(_pack_pair)(ax, ay)

    @jax.jit
    def stage_gather(order):
        return _unpack_pair(pay[order])

    t_gather, (sx, sy) = timeit(stage_gather, order)
    print(f"packed gather+unpack:    {t_gather * 1e3:8.1f} ms/window")
    sid = jax.jit(lambda sy: jnp.sum((sy != 0).astype(jnp.int32), 1) == 0)(sy)

    @jax.jit
    def stage_scan(sx, sy, sid):
        return M.prefix_scan_parts_affine(E, sx, sy, sid)

    t_scan, (inner, offsets, w) = timeit(stage_scan, sx, sy, sid)
    print(f"prefix scan (madd):      {t_scan * 1e3:8.1f} ms/window")

    @jax.jit
    def stage_hist(digits_w):
        return M.bucket_bounds_hist(digits_w, c)

    t_hist, hi = timeit(stage_hist, digits)
    print(f"bucket bounds histogram: {t_hist * 1e3:8.1f} ms/window")

    @jax.jit
    def stage_buckets(hi, inner, offsets):
        def pref_at(idx):
            safe = jnp.maximum(idx, 0)
            pt = E.add(M._take(offsets, safe // w), M._take(inner, safe))
            return E.select(idx >= 0, pt, E.identity(idx.shape))

        pref = pref_at(hi)
        return E.add(
            M._take(pref, slice(1, None)), E.neg(M._take(pref, slice(0, -1)))
        )

    t_bq, bucket = timeit(stage_buckets, hi, inner, offsets)
    print(f"bucket boundary queries: {t_bq * 1e3:8.1f} ms/window")

    @jax.jit
    def stage_triangle(bucket):
        sfx = M.prefix_scan_points(E, bucket, reverse=True)
        return E.sum(sfx, axis=0)

    t_tri, wsum = timeit(stage_triangle, bucket)
    print(f"triangle reduction:      {t_tri * 1e3:8.1f} ms/window")

    @jax.jit
    def stage_fold(pt):
        return M._double_n(E, pt, c)

    single = M._take(inner, jnp.arange(1))
    t_fold, _ = timeit(stage_fold, JPoint(single.x[0], single.y[0], single.z[0]))
    print(f"window fold (c doubles): {t_fold * 1e3:8.1f} ms/window")

    per_window = t_sort + t_gather + t_scan + t_hist + t_bq + t_tri
    num_windows = -(-254 // c)
    print(f"--- per-window total:    {per_window * 1e3:8.1f} ms  x{num_windows} windows")
    print(f"--- extrapolated MSM:    {(t_aff + per_window * num_windows) * 1e3:8.1f} ms "
          f"({n / (t_aff + per_window * num_windows) / 1e6:.2f} Mpts/s)")


if __name__ == "__main__":
    main()
