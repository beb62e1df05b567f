#!/usr/bin/env python
"""On-chip probes for the MXU radix-shuffle building blocks (docs/DESIGN-mxu-gather.md).

Validates, with tiny fast-compiling kernels, BEFORE the full radix pipeline
is built on top of them:
  1. int8 one-hot matmul permutation exactness (bias trick: planes-128 in s8,
     dot s8->s32, +128 on valid rows) at (T,T)@(T,128)
  2. rank-by-coarse-id via (T,P) f32 cumsum inside a kernel
  3. DMA from VMEM scratch to HBM output at a DYNAMIC row offset with the
     sequential-grid overwrite contract
  4. stage timings at production tile sizes

Usage: python tools/probe_radix.py [--t 2048]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=5):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def with_checksum(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        cs = sum(jnp.sum(l.astype(jnp.uint32)) for l in leaves if hasattr(l, "shape"))
        return cs

    cs = with_checksum(*args)
    jax.device_get(cs)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        cs = with_checksum(*args)
        jax.device_get(cs)
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=2048)
    args = ap.parse_args()
    T = args.t

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interp = jax.default_backend() == "cpu"
    rng = np.random.default_rng(7)

    # ---------------- probe 1: s8 one-hot permutation matmul ----------------
    # payload: (T, 32) u32 with 16-bit values + key bits in high half of col 0
    perm = rng.permutation(T).astype(np.int32)  # dst -> src
    payload = rng.integers(0, 1 << 16, size=(T, 32), dtype=np.uint32)
    payload[:, 0] |= rng.integers(0, 1 << 15, size=T, dtype=np.uint32) << 16

    SH = min(512, T)  # output strip height

    def perm_kernel(perm_ref, pay_ref, out_ref):
        # byte planes built in-kernel: (T, 32) u32 -> (T, 128) s8 biased -128
        pay = pay_ref[:]  # (T, 32) uint32
        planes = jnp.concatenate(
            [((pay >> (8 * k)) & 0xFF).astype(jnp.int32) for k in range(4)],
            axis=1,
        )  # (T, 128) 0..255; plane layout: [b0 cols | b1 cols | b2 cols | b3 cols]
        planesb = planes.astype(jnp.bfloat16)  # 0..255 exact in bf16
        srcs = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)[:, 0]
        for k in range(T // SH):
            prow = perm_ref[0, pl.ds(k * SH, SH)]  # (SH,) dst->src
            oh = (prow[:, None] == srcs[None, :]).astype(jnp.bfloat16)  # (SH, T)
            acc = jax.lax.dot_general(
                oh, planesb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (SH, 128)
            # NOTE: reassembly MUST be multiply-by-constant adds, not shifts:
            # `b[:, 64:96] << 16` on lane-sliced values mis-lowers on Mosaic
            # (zeroes bytes < 128); b0+256*b1+65536*b2+16777216*b3 is exact
            # (b3 < 128 in our payloads so no int32 overflow).
            b = acc.astype(jnp.int32)
            out_ref[pl.ds(k * SH, SH), :] = (
                b[:, 0:32]
                + b[:, 32:64] * 256
                + b[:, 64:96] * 65536
                + b[:, 96:128] * 16777216
            ).astype(jnp.uint32)

    @jax.jit
    def run_perm(perm_a, payload_a):
        return pl.pallas_call(
            perm_kernel,
            out_shape=jax.ShapeDtypeStruct((T, 32), jnp.uint32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interp,
        )(perm_a[None, :], payload_a)

    got = np.asarray(run_perm(jnp.asarray(perm), jnp.asarray(payload)))
    want = payload[perm]
    ok1 = np.array_equal(got, want)
    print(f"probe1 s8 one-hot perm exact ({T}x{T}@{T}x128): {'OK' if ok1 else 'FAIL'}")
    if not ok1:
        bad = np.argwhere(got != want)
        print(f"  {len(bad)} mismatched cells; first:", bad[:5].tolist())
        for i, j in bad[:3]:
            print(f"    [{i},{j}] got {got[i,j]:#010x} want {want[i,j]:#010x}")
        rows = np.unique(bad[:, 0])
        print(f"  {len(rows)} bad rows; first rows: {rows[:10].tolist()}")
        cols = np.unique(bad[:, 1])
        print(f"  bad cols: {cols.tolist()}")
    t1 = timeit(run_perm, jnp.asarray(perm), jnp.asarray(payload))
    print(f"  time 1 tile: {t1*1e3:.3f} ms")

    # ---------------- probe 2: rank by coarse id via cumsum ----------------
    P = 512
    keys = rng.integers(0, P, size=T, dtype=np.int32)

    def cumsum0(x):
        """Inclusive cumsum along axis 0 (no pallas lowering for jnp.cumsum):
        log-shift with pltpu.roll + row masking."""
        n = x.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        d = 1
        while d < n:
            sh = pltpu.roll(x, shift=d, axis=0)
            x = x + jnp.where(rows < d, 0.0, sh)
            d *= 2
        return x

    def rank_kernel(k_ref, rank_ref, cnt_ref):
        kv = k_ref[0, :]  # (T,)
        ranks = jnp.zeros((T,), jnp.int32)
        for s in range(P // 128):
            oh = (kv[:, None] == (jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                                  + s * 128)).astype(jnp.float32)  # (T,128)
            csum = cumsum0(oh)  # inclusive
            excl = csum - oh
            ranks = ranks + jnp.sum(excl * oh, axis=1).astype(jnp.int32)
            cnt_ref[0, pl.ds(s * 128, 128)] = csum[T - 1, :].astype(jnp.int32)
        rank_ref[0, :] = ranks

    @jax.jit
    def run_rank(keys_a):
        return pl.pallas_call(
            rank_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((1, T), jnp.int32),
                jax.ShapeDtypeStruct((1, P), jnp.int32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            interpret=interp,
        )(keys_a[None, :])

    ranks, cnts = run_rank(jnp.asarray(keys))
    ranks = np.asarray(ranks)[0]
    cnts = np.asarray(cnts)[0]
    want_rank = np.zeros(T, np.int32)
    seen = {}
    for i, k in enumerate(keys):
        want_rank[i] = seen.get(k, 0)
        seen[k] = want_rank[i] + 1
    want_cnt = np.bincount(keys, minlength=P)
    ok2 = np.array_equal(ranks, want_rank) and np.array_equal(cnts, want_cnt)
    print(f"probe2 rank/count via cumsum (T={T}, P={P}): {'OK' if ok2 else 'FAIL'}")
    t2 = timeit(run_rank, jnp.asarray(keys))
    print(f"  time 1 tile: {t2*1e3:.3f} ms")

    # ---------------- probe 3: dynamic-offset DMA with overwrite ----------------
    # grid of G steps; step i writes ROWS rows at offset base[i]; valid
    # count[i] rows; next step's write overwrites our garbage tail.
    G, ROWS, W = 8, 64, 128
    counts = rng.integers(1, ROWS + 1, size=G).astype(np.int32)
    bases = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    total = int(counts.sum())
    data = rng.integers(0, 1 << 30, size=(G, ROWS, W), dtype=np.int32)

    def dma_kernel(base_ref, d_ref, o_ref, scratch, sem):
        i = pl.program_id(0)
        scratch[:] = d_ref[0]
        cp = pltpu.make_async_copy(
            scratch, o_ref.at[pl.ds(base_ref[i], ROWS), :], sem
        )
        cp.start()
        cp.wait()

    @jax.jit
    def run_dma(bases_a, data_a):
        return pl.pallas_call(
            dma_kernel,
            grid=(G,),
            out_shape=jax.ShapeDtypeStruct((total + ROWS, W), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, ROWS, W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((ROWS, W), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interp,
        )(bases_a, data_a)

    got3 = np.asarray(run_dma(jnp.asarray(bases), jnp.asarray(data)))[:total]
    want3 = np.concatenate([data[i, : counts[i]] for i in range(G)])
    ok3 = np.array_equal(got3, want3)
    print(f"probe3 dynamic-offset DMA overwrite contract: {'OK' if ok3 else 'FAIL'}")

    print("ALL OK" if (ok1 and ok2 and ok3) else "SOME PROBES FAILED")


if __name__ == "__main__":
    main()
