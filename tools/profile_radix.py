#!/usr/bin/env python
"""Time the radix shuffle vs the sort+gather it replaces, at MSM scale.

Usage: python tools/profile_radix.py [--logn 20] [--c 15]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=3, inner=4):
    """Amortized stage timing: runs fn `inner` times and once inside single
    jit dispatches and reports (t_inner - t_1) / (inner - 1) — the ~24 ms
    axon tunnel dispatch floor cancels out."""
    import jax
    import jax.numpy as jnp

    def cs_of(out):
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.uint32)) for l in leaves
                   if hasattr(l, "shape"))

    @jax.jit
    def once(*a):
        return cs_of(fn(*a))

    @jax.jit
    def many(*a):
        # each iteration's first input is perturbed by the running checksum's
        # parity (a data dependency XLA cannot CSE away) — serializes reps
        acc = jnp.zeros((), jnp.uint32)
        for _ in range(inner):
            bump = (acc & 1).astype(a[0].dtype)
            acc = acc + cs_of(fn(a[0] + bump, *a[1:]))
        return acc

    jax.device_get(once(*args))
    jax.device_get(many(*args))

    def best(f):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            jax.device_get(f(*args))
            ts.append(time.time() - t0)
        return min(ts)

    t1 = best(once)
    tn = best(many)
    return max((tn - t1) / (inner - 1), 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=20)
    ap.add_argument("--c", type=int, default=15)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as _ge
    _c = _ge._host_cache_dir(); os.makedirs(_c, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _c)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from halo2_liam_eagen_msm_tpu.ops import radix

    n = 1 << args.logn
    rng = np.random.default_rng(11)
    plan = radix.make_plan(n, args.c)
    print(f"plan: T={plan.T} P={plan.P} S={plan.S} SP={plan.SP} "
          f"OUT_ROWS={plan.OUT_ROWS} R={plan.R} R_pad={plan.R_pad}")

    keys = jnp.asarray(rng.integers(0, 1 << args.c, size=n).astype(np.int32))
    pay = jnp.asarray(rng.integers(1, 1 << 32, size=(n, 16), dtype=np.uint32))

    t = timeit(lambda k, p: radix.radix_window(plan, k, p), keys, pay)
    print(f"radix_window total:    {t*1e3:8.1f} ms/window")

    # stages
    keys2 = keys.reshape(plan.n_tiles, 1, plan.T)
    t_a = timeit(lambda k, p: radix._pass_a_call(plan, k, p), keys2, pay)
    print(f"  pass A (rank+shuffle): {t_a*1e3:6.1f} ms")

    import functools as ft
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    p_cols = max(128, plan.P)
    key_spec = pl.BlockSpec((1, 1, plan.T), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    pay_spec = pl.BlockSpec((plan.T, 16), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def rank_only(k, p):
        return pl.pallas_call(
            ft.partial(radix._rank_kernel, plan),
            grid=(plan.n_tiles,),
            out_shape=(
                jax.ShapeDtypeStruct((plan.n_tiles, 1, plan.T), jnp.int32),
                jax.ShapeDtypeStruct((plan.n_tiles, 1, p_cols), jnp.int32),
            ),
            in_specs=[key_spec, pay_spec],
            out_specs=(
                pl.BlockSpec((1, 1, plan.T), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, p_cols), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        )(k, p)

    t_r = timeit(rank_only, keys2, pay)
    print(f"    rank kernel:         {t_r*1e3:6.1f} ms")
    tiles, cnt = jax.jit(lambda k, p: radix._pass_a_call(plan, k, p))(keys2, pay)

    def transpose_stage(tiles):
        return (tiles[:, :plan.P * plan.S, :]
                .reshape(plan.n_tiles, plan.P, plan.S, 20)
                .transpose(1, 0, 2, 3)
                .reshape(plan.P, plan.R, 20))
    t_t = timeit(transpose_stage, tiles)
    print(f"  transpose:             {t_t*1e3:6.1f} ms")
    main_arr = jax.jit(transpose_stage)(tiles)

    t_b = timeit(lambda m: radix._pass_b_call(plan, m), main_arr)
    print(f"  pass B (fine sort):    {t_b*1e3:6.1f} ms")

    parts, fc = jax.jit(lambda m: radix._pass_b_call(plan, m))(main_arr)
    base = jnp.zeros((plan.P,), jnp.int32)
    t_c = timeit(lambda p, b: radix._compact(plan, p, b), parts, base)
    print(f"  compact (DUS loop):    {t_c*1e3:6.1f} ms")

    # baseline: sort + gather
    def old(keys, pay):
        _, order = jax.lax.sort_key_val(keys, jnp.arange(n, dtype=jnp.int32))
        return pay[order]
    t_o = timeit(old, keys, pay)
    print(f"sort+gather baseline:  {t_o*1e3:8.1f} ms/window")


if __name__ == "__main__":
    main()
