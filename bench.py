#!/usr/bin/env python
"""Headline benchmark: MSM points/sec/chip (Pallas curve) on real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against BASELINE_TARGET = 1e6 points/s — the
reference publishes no numbers (BASELINE.md: all its benchmark output was
never recorded), so the bar is the conventional throughput of a well-tuned
multi-threaded CPU Pippenger at 2^20 (~1M points/s), which the Rust
reference's best_multiexp is an instance of.

Usage: python bench.py [--logn 20] [--window C] [--reps 3]
"""

import argparse
import json
import sys
import time

import numpy as np

BASELINE_TARGET = 1.0e6  # points/s; see module docstring

# ---- MFU accounting (docs/MFU.md) -----------------------------------------
# Algorithmic modmul count of the window method (independent of the reorder
# implementation, so it stays comparable across rounds):
#   per window: ~10 modmuls/point for the blinded XYZZ madd scan, ~1.1 for
#   the offsets recursion (2.1 * n/64 complete adds at ~33), 64 * 2^c for
#   bucket queries + triangle; plus one 4n affine normalization.
# One 254-bit Montgomery modmul in the 16x16-bit limb scheme = 256 schoolbook
# + ~256 reduction u32 lane-multiplies ~ 512.
# v5e VPU u32-multiply ceiling ~ 1e12/s (8x128 lanes x 1 mult-capable ALU
# x ~0.94 GHz effective; see docs/MFU.md).
U32MULTS_PER_MODMUL = 512
VPU_U32MUL_CEILING = 1.0e12


def msm_modmul_count(n: int, c: int, num_windows: int) -> float:
    per_window = 11.1 * n + 64.0 * (1 << c)
    return num_windows * per_window + 4.0 * n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=20)
    ap.add_argument("--window", type=int, default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--distinct", type=int, default=64,
                    help="distinct random base points (tiled; EC cost is data-independent)")
    args = ap.parse_args()

    import random

    import jax

    import __graft_entry__ as _ge
    _c = _ge._host_cache_dir(); __import__("os").makedirs(_c, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _c)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from halo2_liam_eagen_msm_tpu.fields import PALLAS
    from halo2_liam_eagen_msm_tpu.limbs import ints_to_mont_limbs
    from halo2_liam_eagen_msm_tpu.ops.ec import JPoint, ec
    from halo2_liam_eagen_msm_tpu.ops.msm import best_multiexp
    from halo2_liam_eagen_msm_tpu.utils import pyref

    n = 1 << args.logn
    curve = PALLAS
    E = ec(curve)
    rng = random.Random(0xBE7C)
    nprng = np.random.default_rng(0xBE7C)

    # base points: a few truly random ones, tiled to N (branchless EC => the
    # compute cost is identical to fully random inputs)
    base = pyref.random_points(rng, curve, args.distinct)
    reps = n // args.distinct
    xs = np.asarray(ints_to_mont_limbs([p[0] for p in base], curve.field))
    ys = np.asarray(ints_to_mont_limbs([p[1] for p in base], curve.field))
    px = jnp.asarray(np.tile(xs, (reps, 1)))
    py = jnp.asarray(np.tile(ys, (reps, 1)))
    pz = jnp.asarray(np.tile(ints_to_mont_limbs([1], curve.field), (n, 1)))
    pts = JPoint(px, py, pz)

    # full-width random scalars < p (top limb clamped under 2^254)
    sc = nprng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    sc[:, 15] &= 0x3FFF
    scalars = jnp.asarray(sc)

    # warmup / compile (device_get: the axon tunnel's block_until_ready does
    # not reliably synchronize, so force a transfer)
    t0 = time.time()
    r = best_multiexp(curve, scalars, pts, args.window)
    _ = jax.device_get(r.x)
    compile_s = time.time() - t0

    times = []
    for _ in range(args.reps):
        t0 = time.time()
        r = best_multiexp(curve, scalars, pts, args.window)
        _ = jax.device_get(r.x)
        times.append(time.time() - t0)
    best = min(times)
    pps = n / best

    from halo2_liam_eagen_msm_tpu.ops.msm import pick_window

    c = args.window or pick_window(n)
    bits = curve.scalar_field.p.bit_length()
    modmuls = msm_modmul_count(n, c, -(-bits // c))
    mm_per_s = modmuls / best
    print(
        json.dumps(
            {
                "metric": f"msm_points_per_sec_2^{args.logn}_pallas",
                "value": round(pps, 1),
                "unit": "points/s/chip",
                "vs_baseline": round(pps / BASELINE_TARGET, 4),
                "modmul_per_sec": round(mm_per_s, 0),
                "mfu_vs_vpu_ceiling": round(
                    mm_per_s * U32MULTS_PER_MODMUL / VPU_U32MUL_CEILING, 4
                ),
            }
        )
    )
    print(
        f"# n=2^{args.logn} best={best:.3f}s times={['%.3f' % t for t in times]} "
        f"compile={compile_s:.1f}s device={jax.devices()[0]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
