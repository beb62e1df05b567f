"""Shared on-device timing for the tools/ benches.

timeit(): amortized stage timing that cancels the ~25 ms axon-tunnel
dispatch floor: runs fn `inner` times and once inside single jit dispatches
and reports (t_inner - t_1) / (inner - 1).  Each inner repetition's first
argument is perturbed by the running checksum's parity — a data dependency
XLA cannot CSE away — so the repetitions run serially and for real."""

import time


def timeit(fn, *args, reps=3, inner=4):
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
            bump = jax.tree_util.tree_map(
                lambda l: l + (acc & 1).astype(l.dtype), a[0])
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
