#!/usr/bin/env python
"""Stage-level device timings for the radix-reorder MSM window vs classic.

Each timed function reduces its outputs to ONE scalar inside jit — the axon
tunnel makes device_get of large arrays cost seconds, which would swamp the
kernel time being measured.

Usage: python tools/profile_radix_msm.py [--logn 20] [--c 15]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(label, fn, *args, reps=3):
    import jax
    r = jax.device_get(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.device_get(fn(*args))
        ts.append(time.time() - t0)
    print(f"{label:55s} {min(ts)*1000:9.2f} ms", flush=True)
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=20)
    ap.add_argument("--c", type=int, default=15)
    args = ap.parse_args()

    import jax

    import __graft_entry__ as _ge
    _c = _ge._host_cache_dir(); os.makedirs(_c, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _c)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np

    from halo2_liam_eagen_msm_tpu.fields import PALLAS
    from halo2_liam_eagen_msm_tpu.ops import msm as M
    from halo2_liam_eagen_msm_tpu.ops import pallas_ff as PF
    from halo2_liam_eagen_msm_tpu.ops import radix as RX
    from halo2_liam_eagen_msm_tpu.ops.ec import ec

    n = 1 << args.logn
    c = args.c
    curve = PALLAS
    E = ec(curve)
    rng = np.random.default_rng(7)

    keys = jnp.asarray(rng.integers(0, 1 << c, (n,)).astype(np.int32))
    plan = RX.make_plan(n, c)
    print(f"# plan T={plan.T} P={plan.P} S={plan.S} SP={plan.SP} "
          f"n_ext={plan.n_ext} OUT_ROWS={plan.OUT_ROWS} R={plan.R}")

    # real EC payload (tiled points) so scan math is representative
    from halo2_liam_eagen_msm_tpu.limbs import ints_to_mont_limbs
    from halo2_liam_eagen_msm_tpu.utils import pyref
    import random as pyrandom
    rr = pyrandom.Random(3)
    base = pyref.random_points(rr, curve, 64)
    xs = np.asarray(ints_to_mont_limbs([p[0] for p in base], curve.field))
    ys = np.asarray(ints_to_mont_limbs([p[1] for p in base], curve.field))
    ax = jnp.asarray(np.tile(xs, (n // 64, 1)))
    ay = jnp.asarray(np.tile(ys, (n // 64, 1)))
    pay = jax.jit(M._pack_pair)(ax, ay)

    # A. classic reorder (sort + gather + hist)
    @jax.jit
    def classic_reorder(k, p):
        _, order = jax.lax.sort_key_val(k, jnp.arange(n, dtype=jnp.int32))
        rows = p[order]
        hi = M.bucket_bounds_hist(k, c)
        return jnp.sum(rows, dtype=jnp.uint32) + jnp.sum(
            hi.astype(jnp.uint32))

    bench("A. classic sort + gather + hist", classic_reorder, keys, pay)

    # B. radix_window alone
    @jax.jit
    def rw(k, p):
        sp, hi, spp, spk, ov = RX.radix_window(plan, k, p)
        return (jnp.sum(sp, dtype=jnp.uint32)
                + jnp.sum(hi.astype(jnp.uint32))
                + jnp.sum(spp, dtype=jnp.uint32), ov)

    _, ov = bench("B. radix_window (A+transpose+B+compact)", rw, keys, pay)
    print(f"   overflow={bool(ov)}")

    unit = PF.SCAN_W * PF.SCAN_LANES

    def scan_sum(rows_, m):
        pad = -m % unit
        if pad:
            rows_ = jnp.concatenate(
                [rows_, jnp.zeros((pad, 16), jnp.uint32)])
        inner, off, w, exc = M.prefix_scan_parts_packed_fast(E, rows_)
        return sum(jnp.sum(t, dtype=jnp.uint32) for t in inner) + jnp.sum(
            off.x, dtype=jnp.uint32)

    # C/D: scans over the two stream lengths (content irrelevant for time)
    srt = jax.jit(lambda k, p: p[jax.lax.sort_key_val(
        k, jnp.arange(n, dtype=jnp.int32))[1]])(keys, pay)
    bench("C. fused scan over classic stream (n rows)",
          jax.jit(lambda r: scan_sum(r, n)), srt)
    sp_ext = jax.jit(lambda k, p: RX.radix_window(plan, k, p)[0])(keys, pay)
    bench("D. fused scan over radix stream (n_ext rows)",
          jax.jit(lambda r: scan_sum(r, plan.n_ext)), sp_ext)

    # E. spill side path (sort + hist + padded scan)
    ns = plan.n_tiles * plan.SP
    spk = jnp.asarray(rng.integers(0, 1 << c, (ns,)).astype(np.int32))

    @jax.jit
    def spill_path(sk, sp):
        _, so = jax.lax.sort_key_val(sk, jnp.arange(ns, dtype=jnp.int32))
        srows = sp[so]
        shi = M.bucket_bounds_hist(sk, c)
        return scan_sum(srows, ns) + jnp.sum(shi.astype(jnp.uint32))

    bench(f"E. spill path (sort+hist+scan, {ns} rows)", spill_path,
          spk, pay[:ns])

    # F/G: whole windows
    ow = M._make_one_window(E, c, "fast", pay, n)

    def whole(owf):
        def f(k):
            r, e = owf(k)
            return jnp.sum(r.x, dtype=jnp.uint32), e
        return jax.jit(f)

    bench("F. WHOLE window (radix path)", whole(ow), keys)

    from halo2_liam_eagen_msm_tpu import config as cfg
    cfg.RADIX_MSM = False
    owc = M._make_one_window(E, c, "fast", pay, n)
    bench("G. WHOLE window (classic path)", whole(owc), keys)
    cfg.RADIX_MSM = True


if __name__ == "__main__":
    main()
