#!/usr/bin/env python
"""Validate ops/radix.radix_window bit-exactly against a numpy model.

Checks, for random keys/payloads (with identity rows interspersed):
  * main rows are bucket-contiguous and contain exactly the non-spilled
    valid rows (multiset equality per bucket vs the numpy slot simulation)
  * hi[] matches the main-row bucket counts (bucket_bounds_hist convention)
  * spill rows are exactly the numpy-predicted spills
  * overflow flag agrees

Usage: python tools/validate_radix.py [--logn 13] [--c 15] [--seed 3]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def numpy_model(plan, keys, pay):
    """Slot-exact simulation of pass A + transpose + pass B."""
    n, T, P, S, SP = plan.n, plan.T, plan.P, plan.S, plan.SP
    n_tiles = n // T
    valid = (pay != 0).any(axis=1)
    coarse = keys >> plan.fb
    # per (tile, partition) slot fill, tile-major row order
    slots = [[[] for _ in range(P)] for _ in range(n_tiles)]
    spills = [[] for _ in range(n_tiles)]
    for i in range(n):
        if not valid[i]:
            continue
        t = i // T
        p = int(coarse[i])
        row = pay[i].copy()
        row[0] |= np.uint32(keys[i]) << 16
        if len(slots[t][p]) < S:
            slots[t][p].append(row)
        elif len(spills[t]) < SP:
            spills[t].append(row)
    overflow = False
    for t in range(n_tiles):
        need = sum(1 for i in range(t * T, (t + 1) * T)
                   if valid[i] and len(slots[t][int(coarse[i])]) >= 0)
    # overflow: recount exactly
    for t in range(n_tiles):
        cnt = np.zeros(P, np.int64)
        for i in range(t * T, (t + 1) * T):
            if valid[i]:
                cnt[coarse[i]] += 1
        spill_need = int(np.maximum(cnt - S, 0).sum())
        if spill_need > SP:
            overflow = True
    # partition-major, fine-stable order
    main_sorted = []
    fine_counts = np.zeros((P, 1 << plan.fb), np.int64)
    for p in range(P):
        rows = []
        for t in range(n_tiles):
            rows.extend(slots[t][p])
        rows.sort(key=lambda r: (r[0] >> 16) & ((1 << plan.fb) - 1))
        for r in rows:
            fine_counts[p][(r[0] >> 16) & ((1 << plan.fb) - 1)] += 1
        main_sorted.extend(rows)
    hi = np.cumsum(fine_counts.reshape(-1)) - 1
    spill_rows = []
    for t in range(n_tiles):
        spill_rows.extend(spills[t])
        spill_rows.extend([np.zeros(32, np.uint32)] * (SP - len(spills[t])))
    return (np.array(main_sorted).reshape(-1, 32) if main_sorted else
            np.zeros((0, 32), np.uint32)), hi.astype(np.int64), \
        np.array(spill_rows).reshape(-1, 32), overflow


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
    pay = rng.integers(0, 1 << 16, size=(n, 32), dtype=np.uint32)
    # sprinkle identities (both halves zero) and zero keys
    ident = rng.random(n) < 0.01
    pay[ident] = 0
    keys[rng.random(n) < 0.01] = 0

    sx, sy, hi, spill, overflow = radix.radix_window(
        plan, jnp.asarray(keys), jnp.asarray(pay)
    )
    sx, sy, hi, spill = (np.asarray(sx), np.asarray(sy), np.asarray(hi),
                         np.asarray(spill))
    overflow = bool(overflow)

    m_main, m_hi, m_spill, m_overflow = numpy_model(plan, keys, pay)

    assert overflow == m_overflow, (overflow, m_overflow)
    nvalid = m_main.shape[0]
    got_main = np.concatenate(
        [sx, sy], axis=1
    )[:nvalid]
    # radix strips the key bits from col 0 of sx; strip them in the model too
    m_x = m_main[:, :16].copy()
    m_x[:, 0] &= 0xFFFF
    m_y = m_main[:, 16:]
    want_main = np.concatenate([m_x, m_y], axis=1)
    # within (bucket) the order must agree EXACTLY (tile-major stable)
    ok_main = np.array_equal(got_main, want_main)
    print("main rows exact:", ok_main)
    if not ok_main:
        bad = np.argwhere((got_main != want_main).any(axis=1)).ravel()
        print("  first bad rows:", bad[:5], "of", nvalid)
        i = bad[0]
        print("  got ", got_main[i][:4], "...")
        print("  want", want_main[i][:4], "...")
    # tail must be zero rows
    ok_tail = (sy[nvalid:] == 0).all()
    print("tail identity:", bool(ok_tail))
    ok_hi = np.array_equal(hi, m_hi)
    print("hi exact:", ok_hi)
    if not ok_hi:
        bad = np.argwhere(hi != m_hi).ravel()
        print("  first bad buckets:", bad[:5], hi[bad[:5]], m_hi[bad[:5]])
    ok_spill = np.array_equal(spill, m_spill)
    print("spill exact:", ok_spill)
    if not ok_spill:
        bad = np.argwhere((spill != m_spill).any(axis=1)).ravel()
        print("  first bad spill rows:", bad[:5], "of", m_spill.shape[0])
    print("ALL OK" if (ok_main and ok_tail and ok_hi and ok_spill) else "FAIL")


if __name__ == "__main__":
    main()
