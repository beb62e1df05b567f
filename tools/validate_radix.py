#!/usr/bin/env python
"""Validate ops/radix.radix_window bit-exactly against a numpy model.

Checks, for random keys/payloads (with identity rows interspersed):
  * the output stream is bucket-contiguous and contains exactly the
    non-spilled valid rows in (partition, fine, tile-major) order, with
    zero ghost rows padding each partition to the DMA alignment unit
  * hi[] matches the model's per-bucket end positions
  * spill rows/keys are exactly the numpy-predicted spills
  * overflow flag agrees

Usage: python tools/validate_radix.py [--logn 13] [--c 15] [--seed 3]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def numpy_model(plan, keys, pay):
    """Slot-exact simulation of pass A + transpose + pass B + compact."""
    from halo2_liam_eagen_msm_tpu.ops.radix import GHOST

    n, T, P, S, SP = plan.n, plan.T, plan.P, plan.S, plan.SP
    n_tiles = n // T
    valid = (pay != 0).any(axis=1)
    coarse = keys >> plan.fb
    slots = [[[] for _ in range(P)] for _ in range(n_tiles)]
    spills = [[] for _ in range(n_tiles)]
    spill_keys = [[] for _ in range(n_tiles)]
    for i in range(n):
        if not valid[i]:
            continue
        t = i // T
        p = int(coarse[i])
        if len(slots[t][p]) < S:
            slots[t][p].append((pay[i], int(keys[i])))
        elif len(spills[t]) < SP:
            spills[t].append(pay[i])
            spill_keys[t].append(int(keys[i]))
    overflow = False
    for t in range(n_tiles):
        cnt = np.zeros(P, np.int64)
        for i in range(t * T, (t + 1) * T):
            if valid[i]:
                cnt[coarse[i]] += 1
        if int(np.maximum(cnt - S, 0).sum()) > SP:
            overflow = True
    # partition-major, fine-stable order, ghost-padded per partition
    stream = []
    fine_counts = np.zeros((P, 1 << plan.fb), np.int64)
    bases = []
    fmask = (1 << plan.fb) - 1
    for p in range(P):
        rows = []
        for t in range(n_tiles):
            rows.extend(slots[t][p])
        rows.sort(key=lambda rk: rk[1] & fmask)
        for _, k in rows:
            fine_counts[p][k & fmask] += 1
        bases.append(len(stream))
        stream.extend(r for r, _ in rows)
        stream.extend([np.zeros(16, np.uint32)] * ((-len(rows)) % GHOST))
    bases = np.array(bases)
    hi = (bases[:, None] + np.cumsum(fine_counts, axis=1) - 1).reshape(-1)
    sp_pay, sp_keys = [], []
    for t in range(n_tiles):
        sp_pay.extend(spills[t])
        sp_pay.extend([np.zeros(16, np.uint32)] * (SP - len(spills[t])))
        sp_keys.extend(spill_keys[t])
        sp_keys.extend([0] * (SP - len(spill_keys[t])))
    return (np.array(stream).reshape(-1, 16), hi.astype(np.int64),
            np.array(sp_pay).reshape(-1, 16), np.array(sp_keys), overflow)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=13)
    ap.add_argument("--c", type=int, default=15)
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args()

    import jax.numpy as jnp

    from halo2_liam_eagen_msm_tpu.ops import radix

    n = 1 << args.logn
    rng = np.random.default_rng(args.seed)
    plan = radix.make_plan(n, args.c)
    print(f"plan: T={plan.T} P={plan.P} S={plan.S} SP={plan.SP} "
          f"OUT_ROWS={plan.OUT_ROWS} R={plan.R} R_pad={plan.R_pad}")

    keys = rng.integers(0, 1 << args.c, size=n).astype(np.int32)
    pay = rng.integers(0, 1 << 32, size=(n, 16), dtype=np.uint32)
    ident = rng.random(n) < 0.01
    pay[ident] = 0
    keys[rng.random(n) < 0.01] = 0

    sorted_pay, hi, spill_pay, spill_keys, overflow = radix.radix_window(
        plan, jnp.asarray(keys), jnp.asarray(pay)
    )
    sorted_pay, hi = np.asarray(sorted_pay), np.asarray(hi)
    spill_pay, spill_keys = np.asarray(spill_pay), np.asarray(spill_keys)
    overflow = bool(overflow)

    m_main, m_hi, m_spill, m_spill_keys, m_overflow = numpy_model(
        plan, keys, pay)

    assert overflow == m_overflow, (overflow, m_overflow)
    nvalid = m_main.shape[0]
    assert sorted_pay.shape[0] == plan.n_ext and nvalid <= plan.n_ext
    ok_main = np.array_equal(sorted_pay[:nvalid], m_main)
    print("main rows exact:", ok_main)
    if not ok_main:
        bad = np.argwhere((sorted_pay[:nvalid] != m_main).any(axis=1)).ravel()
        print("  first bad rows:", bad[:5], "of", nvalid)
        i = bad[0]
        print("  got ", sorted_pay[i][:4], "...")
        print("  want", m_main[i][:4], "...")
    ok_tail = (sorted_pay[nvalid:] == 0).all()
    print("tail identity:", bool(ok_tail))
    ok_hi = np.array_equal(hi, m_hi)
    print("hi exact:", ok_hi)
    if not ok_hi:
        bad = np.argwhere(hi != m_hi).ravel()
        print("  first bad buckets:", bad[:5], hi[bad[:5]], m_hi[bad[:5]])
    ok_spill = (np.array_equal(spill_pay, m_spill)
                and np.array_equal(spill_keys, m_spill_keys))
    print("spill exact:", ok_spill)
    print("ALL OK" if (ok_main and ok_tail and ok_hi and ok_spill) else "FAIL")


if __name__ == "__main__":
    main()
