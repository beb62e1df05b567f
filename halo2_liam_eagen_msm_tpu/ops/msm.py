"""Pippenger multi-scalar multiplication (the reference's best_multiexp).

First-class build item per SURVEY.md §2: in the reference, `best_multiexp`
(halo2 fork `arithmetic`) is both the oracle for the Eagen argument
(/root/reference/src/argument_witness_calc.rs:144) and the operation the whole
argument verifies.  It is also this framework's headline benchmark kernel
(BASELINE.md: MSM points/sec/chip at 2^20, Pallas).

TPU-shaped bucket method — there is no efficient data-dependent scatter on
TPU, so bucket accumulation is reformulated sort-first and scatter-free:

  for each c-bit window (all windows vmapped in parallel):
    1. bucket id per point (static bit extraction from limb arrays)
    2. sort point indices by bucket id (jax.lax.sort_key_val)
    3. ONE unsegmented inclusive prefix scan of the sorted points
       (blocked two-level lax.scan: ~2N adds, ~2*sqrt(N) sequential steps)
    4. bucket sums = prefix[range_end] - prefix[range_start-1], with ranges
       located by vectorized binary search (searchsorted) — EC subtraction is
       free (negate y), so no segmented combine is needed at all
    5. triangle reduction: suffix-scan of the bucket table, then total sum
       (sum_b b*B_b = sum_k suffix_k)
  window fold: result = sum_w 2^(cw) G_w by c doublings per window

All EC math is the batched branchless Jacobian law from ops/ec.py (identity
handled by masks), so empty buckets and zero digits need no special-casing:
bucket 0 is simply never queried, and empty ranges yield P - P = identity.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import CurveSpec, LIMB_BITS, N_LIMBS
from ..limbs import ints_to_limbs
from .ec import EC, JPoint, ec


# ---------------------------------------------------------------------------
# generic blocked scans over point arrays
# ---------------------------------------------------------------------------

def _take(p: JPoint, idx) -> JPoint:
    return JPoint(p.x[idx], p.y[idx], p.z[idx])


def _blocked_prefix_wide(E: EC, p: JPoint) -> JPoint:
    """Inclusive prefix sums, Pallas path: recursive blocked scan.

    Each level runs a 64-step lax.scan whose body is ONE wide Pallas EC-add
    over n/64 lanes, then recurses on the 64-fold-smaller block totals.  Few
    kernel instances (fast compile on remote-compile backends), wide steps
    (latency-tolerant), ~2.1n total adds."""
    n = p.x.shape[0]
    if n <= 64:
        def step(carry, el):
            nc = E.add(carry, JPoint(*el))
            return nc, nc

        _, pref = jax.lax.scan(step, E.identity(()), tuple(p))
        return JPoint(*pref)
    w = 64
    g = -(-n // w)
    pad = w * g - n
    if pad:
        idp = E.identity((pad,))
        p = JPoint(
            jnp.concatenate([p.x, idp.x]),
            jnp.concatenate([p.y, idp.y]),
            jnp.concatenate([p.z, idp.z]),
        )
    cols = JPoint(
        p.x.reshape(g, w, N_LIMBS).swapaxes(0, 1),
        p.y.reshape(g, w, N_LIMBS).swapaxes(0, 1),
        p.z.reshape(g, w, N_LIMBS).swapaxes(0, 1),
    )  # (w, g): scan over w steps, g-wide

    def step(carry, col):
        nc = E.add(carry, JPoint(*col))
        return nc, nc

    totals, inner = jax.lax.scan(step, E.identity((g,)), tuple(cols))
    tot_prefix = _blocked_prefix_wide(E, totals)  # inclusive (g,)
    ident = E.identity((1,))
    offsets = JPoint(
        jnp.concatenate([ident.x, tot_prefix.x[:-1]]),
        jnp.concatenate([ident.y, tot_prefix.y[:-1]]),
        jnp.concatenate([ident.z, tot_prefix.z[:-1]]),
    )
    off_b = JPoint(
        jnp.broadcast_to(offsets.x[None], inner.x.shape),
        jnp.broadcast_to(offsets.y[None], inner.y.shape),
        jnp.broadcast_to(offsets.z[None], inner.z.shape),
    )
    full = E.add(off_b, inner)  # (w, g)
    out = JPoint(
        full.x.swapaxes(0, 1).reshape(g * w, N_LIMBS),
        full.y.swapaxes(0, 1).reshape(g * w, N_LIMBS),
        full.z.swapaxes(0, 1).reshape(g * w, N_LIMBS),
    )
    return _take(out, jnp.arange(n))


def prefix_scan_points(E: EC, p: JPoint, reverse: bool = False) -> JPoint:
    """Inclusive prefix (or suffix) sums of a (N,) JPoint array under EC
    addition.  Two-level blocked scan: `lax.scan` along columns of a
    (W, G)-reshaped view (compiled-once add body, G-wide), then a thin scan
    over the G block totals, then one vectorized offset apply.  ~2N adds,
    ~W + G sequential steps (W ~ G ~ sqrt(N))."""
    n = p.x.shape[0]
    if n == 1:
        return p
    from .. import config as _cfg

    if reverse:
        rev = _take(p, jnp.arange(n - 1, -1, -1))
        out = prefix_scan_points(E, rev, reverse=False)
        return _take(out, jnp.arange(n - 1, -1, -1))
    if _cfg.use_pallas():
        return _blocked_prefix_wide(E, p)

    g = max(1, min(1 << ((int(math.isqrt(n - 1)) + 1).bit_length() - 1), 4096))
    w = -(-n // g)
    pad = g * w - n
    if pad:
        idp = E.identity((pad,))
        p = JPoint(
            jnp.concatenate([p.x, idp.x]),
            jnp.concatenate([p.y, idp.y]),
            jnp.concatenate([p.z, idp.z]),
        )
    # blocks are rows: block b covers [b*w, (b+1)*w)
    cols = JPoint(
        p.x.reshape(g, w, N_LIMBS).swapaxes(0, 1),
        p.y.reshape(g, w, N_LIMBS).swapaxes(0, 1),
        p.z.reshape(g, w, N_LIMBS).swapaxes(0, 1),
    )  # (w, g, ...): scan over w steps, g-wide

    def step(carry, col):
        newc = E.add(carry, JPoint(*col))
        return newc, newc

    totals, inner = jax.lax.scan(step, E.identity((g,)), tuple(cols))
    # inner: (w, g) inclusive within-block prefixes; totals: (g,) block sums
    def step2(carry, tot):
        out = carry  # exclusive
        newc = E.add(carry, JPoint(*tot))
        return newc, out

    _, offsets = jax.lax.scan(step2, E.identity(()), tuple(totals))
    # apply block offsets (exclusive) to every element of the block
    off_b = JPoint(
        jnp.broadcast_to(offsets.x[None, :, :], inner.x.shape),
        jnp.broadcast_to(offsets.y[None, :, :], inner.y.shape),
        jnp.broadcast_to(offsets.z[None, :, :], inner.z.shape),
    )
    full = E.add(off_b, inner)  # (w, g)
    out = JPoint(
        full.x.swapaxes(0, 1).reshape(g * w, N_LIMBS),
        full.y.swapaxes(0, 1).reshape(g * w, N_LIMBS),
        full.z.swapaxes(0, 1).reshape(g * w, N_LIMBS),
    )
    return _take(out, jnp.arange(n))


# ---------------------------------------------------------------------------
# Pippenger
# ---------------------------------------------------------------------------

def window_digits(scalars, c: int, num_windows: int):
    """Extract c-bit windows from (N, 16) uint32 scalar limb arrays.
    Returns (num_windows, N) int32 bucket ids."""
    n = scalars.shape[0]
    total_bits = N_LIMBS * LIMB_BITS
    out = []
    for w in range(num_windows):
        lo_bit = w * c
        acc = jnp.zeros((n,), dtype=jnp.int32)
        for b in range(c):
            bit_idx = lo_bit + b
            if bit_idx >= total_bits:
                break
            limb = bit_idx // LIMB_BITS
            off = bit_idx % LIMB_BITS
            bit = (scalars[:, limb] >> off) & 1
            acc = acc | (bit.astype(jnp.int32) << b)
        out.append(acc)
    return jnp.stack(out)


def pick_window(n: int) -> int:
    """Window size heuristic (same spirit as the reference's best_multiexp:
    ~ln(n), capped)."""
    if n < 4:
        return 1
    return min(max(int(math.log2(n)) - 3, 1), 16)


def best_multiexp(
    curve: CurveSpec,
    scalars,
    pts: JPoint,
    c: int | None = None,
    max_scalar_bits: int | None = None,
) -> JPoint:
    """MSM sum_i s_i * P_i.

    scalars: (N, 16) uint32 canonical (NOT Montgomery) scalar-field limbs;
    pts: (N,) batched JPoint.  Returns a single JPoint.  Result-compatible
    with pyref.ec_msm and the reference's best_multiexp.

    max_scalar_bits: promise that all scalars fit that many bits — cuts the
    window count proportionally (the Eagen argument's scalars are < sqrt(p),
    reference argument_witness_calc.rs:97, so 128 bits suffice there).

    Jitted with (curve, c, bits) static: repeat calls at the same shape reuse
    the compiled executable."""
    n = scalars.shape[0]
    if c is None:
        c = pick_window(n)
    bits = max_scalar_bits or curve.scalar_field.p.bit_length()
    # cap concurrent windows so the per-window prefix-scan buffers (~3x the
    # point array each) stay within HBM at large N
    wb = max(1, min(-(-bits // c), (1 << 24) // max(n, 1) or 1, 8))
    return _best_multiexp_jit(curve, c, bits, wb, scalars, pts)


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _best_multiexp_jit(
    curve: CurveSpec, c: int, total_bits: int, window_batch: int, scalars, pts: JPoint
) -> JPoint:
    E = ec(curve)
    n = scalars.shape[0]
    num_windows = -(-total_bits // c)
    digits = window_digits(scalars, c, num_windows)  # (W, N) int32

    def one_window(keys_in):
        keys, order = jax.lax.sort_key_val(keys_in, jnp.arange(n, dtype=jnp.int32))
        spts = _take(pts, order)
        prefix = prefix_scan_points(E, spts)
        bvals = jnp.arange(1, 1 << c, dtype=jnp.int32)
        hi = jnp.searchsorted(keys, bvals, side="right").astype(jnp.int32) - 1
        lo = jnp.searchsorted(keys, bvals, side="left").astype(jnp.int32) - 1

        def pref_at(idx):
            safe = jnp.maximum(idx, 0)
            pt = _take(prefix, safe)
            return E.select(idx >= 0, pt, E.identity(idx.shape))

        bucket = E.add(pref_at(hi), E.neg(pref_at(lo)))  # (2^c - 1,)
        sfx = prefix_scan_points(E, bucket, reverse=True)
        return E.sum(sfx, axis=0)

    from .. import config as _cfg

    if _cfg.use_pallas():
        # sequential windows: the pallas kernels inside prefer plain shapes
        # (each step is already a full-width batched kernel)
        window_sums = jax.lax.map(one_window, digits)
    elif window_batch >= num_windows:
        window_sums = jax.vmap(one_window)(digits)  # (W,) point batch
    else:
        window_sums = jax.lax.map(one_window, digits, batch_size=window_batch)

    def fold(i, acc):
        acc = _double_n(E, acc, c)
        g = _take(window_sums, num_windows - 1 - i)
        return E.add(acc, g)

    return jax.lax.fori_loop(0, num_windows, fold, E.identity(()))


def _double_n(E: EC, p: JPoint, k: int) -> JPoint:
    return jax.lax.fori_loop(0, k, lambda _, q: E.double(q), p)


# ---------------------------------------------------------------------------
# host helpers
# ---------------------------------------------------------------------------

def scalars_to_limbs(scalars, curve: CurveSpec):
    """List of ints (scalar field) -> (N, 16) uint32 canonical limb array."""
    q = curve.scalar_field.p
    return jnp.asarray(ints_to_limbs([s % q for s in scalars]))


def msm_ints(curve: CurveSpec, scalars, pts_ints, c: int | None = None,
             max_scalar_bits: int | None = None):
    """Convenience: host ints/points -> MSM -> affine int point or None."""
    E = ec(curve)
    s = scalars_to_limbs(scalars, curve)
    p = E.points_from_ints(pts_ints)
    res = best_multiexp(curve, s, p, c, max_scalar_bits)
    return E.points_to_ints(JPoint(res.x[None], res.y[None], res.z[None]))[0]
