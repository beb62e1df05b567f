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
    4. bucket sums = prefix[range_end] - prefix[range_start-1], with range
       boundaries from an exact one-hot matmul histogram on the MXU — EC
       subtraction is free (negate y), so no segmented combine is needed
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


def _pick_block_width(n: int) -> int:
    """Sequential steps per block for the blocked scans.  On Pallas-class
    backends few wide steps win — but only while each step stays at full
    occupancy: keep g = n/w >= 2048 lanes (2 blocks) so mid-size scans
    (e.g. the 2^c-1 bucket triangle) don't degrade into launch-bound
    sequences of half-empty kernels.  On CPU a ~sqrt split balances the two
    scan levels."""
    from .. import config as _cfg

    if _cfg.use_pallas():
        return max(2, min(64, n // 2048))
    g = max(1, min(1 << ((int(math.isqrt(n - 1)) + 1).bit_length() - 1), 4096))
    # w >= 2 guarantees the block count g strictly shrinks, terminating the
    # parts -> block-totals-prefix recursion
    return max(2, -(-n // g))


def _pow2_pad(n: int) -> int:
    """Padding that takes n up to the next power of two (0 if already)."""
    return (1 << max(n - 1, 1).bit_length()) - n if n & (n - 1) else 0


def _pad_pts(E: EC, p: JPoint, pad: int) -> JPoint:
    if not pad:
        return p
    idp = E.identity((pad,))
    return JPoint(
        jnp.concatenate([p.x, idp.x]),
        jnp.concatenate([p.y, idp.y]),
        jnp.concatenate([p.z, idp.z]),
    )


def _to_cols(arr, g, w):
    """(g*w, 16) -> (w, g, 16): block j = elements [j*w, (j+1)*w)."""
    return arr.reshape(g, w, N_LIMBS).swapaxes(0, 1)


def _from_cols(arr, g, w):
    return arr.swapaxes(0, 1).reshape(g * w, N_LIMBS)


def prefix_scan_parts(E: EC, p: JPoint):
    """Blocked inclusive prefix-sum DECOMPOSITION of a (N,) JPoint array:
    returns (inner: JPoint (g*w,), offsets: JPoint (g,), w) with

        inclusive_prefix[i] = offsets[i // w] + inner[i]      (i < N)

    The full prefix array is never materialized — Pippenger only queries
    O(2^c) boundary positions per window, so skipping the N-wide offset
    apply nearly halves the EC adds of the dominant scan (~1.05N vs ~2.1N)."""
    n = p.x.shape[0]
    w = _pick_block_width(n)
    g = -(-n // w)
    p = _pad_pts(E, p, g * w - n)
    cols = JPoint(*(_to_cols(c, g, w) for c in p))  # (w, g)

    def step(carry, col):
        nc = E.add(carry, JPoint(*col))
        return nc, nc

    totals, inner = jax.lax.scan(step, E.identity((g,)), tuple(cols))
    inner = JPoint(*(_from_cols(c, g, w) for c in inner))
    if g == 1:
        return inner, E.identity((1,)), w
    tot_prefix = prefix_scan_points(E, totals)  # (g,) inclusive, recursive
    ident = E.identity((1,))
    offsets = JPoint(
        jnp.concatenate([ident.x, tot_prefix.x[:-1]]),
        jnp.concatenate([ident.y, tot_prefix.y[:-1]]),
        jnp.concatenate([ident.z, tot_prefix.z[:-1]]),
    )
    return inner, offsets, w


def prefix_scan_parts_affine(E: EC, ax, ay, aident):
    """prefix_scan_parts for AFFINE inputs (x, y, identity-mask): the inner
    scan uses mixed (madd) addition — ~35% fewer field muls than the full
    Jacobian add that dominates Pippenger's cost."""
    n = ax.shape[0]
    w = _pick_block_width(n)
    g = -(-n // w)
    pad = g * w - n
    if pad:
        ax = jnp.concatenate([ax, jnp.zeros((pad, N_LIMBS), ax.dtype)])
        ay = jnp.concatenate([ay, jnp.zeros((pad, N_LIMBS), ay.dtype)])
        aident = jnp.concatenate([aident, jnp.ones((pad,), aident.dtype)])
    xc = _to_cols(ax, g, w)
    yc = _to_cols(ay, g, w)
    mc = aident.reshape(g, w).swapaxes(0, 1)

    def step(carry, el):
        qx, qy, qm = el
        nc = E.add_mixed(carry, qx, qy, qm)
        return nc, nc

    totals, inner = jax.lax.scan(step, E.identity((g,)), (xc, yc, mc))
    inner = JPoint(*(_from_cols(c, g, w) for c in inner))
    if g == 1:
        return inner, E.identity((1,)), w
    tot_prefix = prefix_scan_points(E, totals)
    ident = E.identity((1,))
    offsets = JPoint(
        jnp.concatenate([ident.x, tot_prefix.x[:-1]]),
        jnp.concatenate([ident.y, tot_prefix.y[:-1]]),
        jnp.concatenate([ident.z, tot_prefix.z[:-1]]),
    )
    return inner, offsets, w


def prefix_scan_parts_affine_fast(E: EC, ax, ay):
    """Offset-blinded fast variant of prefix_scan_parts_affine: every block
    carry is seeded at the fixed blinding point T (EC.offset_point), so the
    inner scan can use the exception-free XYZZ mixed add (2 sqr + 8 mul vs
    ~21 modmuls for the complete add) — the carried ZZ/ZZZ make each step's
    z^2/z^3 free, one square cheaper than even the fast Jacobian madd.
    Exceptional slots (identity carry / carry == +-Q) cannot occur unless
    inputs are adversarially aligned with T; they are *detected* and
    reported so the caller can fall back to the safe scan.

    The affine identity is encoded as ay == 0 (to_affine's convention, exact
    on prime-order curves) — no separate mask array is streamed or padded.

    Returns (inner, offsets, w, exc):
        inner    XYZZ 4-tuple of (g*w, 16) arrays,
        offsets  Jacobian JPoint (g,),
    with offsets[i // w] + inner[i] = T + true_inclusive_prefix[i]
    (exactly one T regardless of position — block totals are un-blinded
    before the offsets recursion), and exc a scalar bool."""
    n = ax.shape[0]
    w = _pick_block_width(n)
    g = -(-n // w)
    pad = g * w - n
    if pad:
        ax = jnp.concatenate([ax, jnp.zeros((pad, N_LIMBS), ax.dtype)])
        ay = jnp.concatenate([ay, jnp.zeros((pad, N_LIMBS), ay.dtype)])
    xc = _to_cols(ax, g, w)
    yc = _to_cols(ay, g, w)

    def step(carry, el):
        pt, ex = carry
        qx, qy = el
        nx, ny, nzz, nzzz, e = E.madd_xyzz_fast(*pt, qx, qy)
        return ((nx, ny, nzz, nzzz), ex | e), (nx, ny, nzz, nzzz)

    t0 = E.xyzz_offset((g,))
    ((tx, ty, tzz, tzzz), exc_v), inner4 = jax.lax.scan(
        step, (t0, jnp.zeros((g,), dtype=bool)), (xc, yc)
    )
    exc = jnp.any(exc_v)
    inner = tuple(_from_cols(c, g, w) for c in inner4)
    if g == 1:
        return inner, E.identity((1,)), w, exc
    # un-blind the block totals (safe full adds, only g elements)
    totals_t = E.xyzz_to_jacobian(tx, ty, tzz, tzzz)
    totals = E.add(totals_t, E.neg(E.offset_point((g,))))
    tot_prefix = prefix_scan_points(E, totals)
    ident = E.identity((1,))
    offsets = JPoint(
        jnp.concatenate([ident.x, tot_prefix.x[:-1]]),
        jnp.concatenate([ident.y, tot_prefix.y[:-1]]),
        jnp.concatenate([ident.z, tot_prefix.z[:-1]]),
    )
    return inner, offsets, w, exc


def prefix_scan_parts_packed_fast(E: EC, pay_sorted):
    """Fused-kernel variant of prefix_scan_parts_affine_fast consuming the
    PACKED sorted rows directly: the whole 64-step blinded scan is ONE
    pallas launch with the XYZZ carry resident in VMEM
    (pallas_ff.fused_madd_scan_xyzz) — no per-step dispatch, no carry HBM
    round-trips, no separate unpack materialization.

    Returns (inner, offsets, w, exc) where inner is the XYZZ 4-tuple in
    (w, 16, g) layout — element i lives at [i % w, :, i // w] — and
    offsets/exc follow prefix_scan_parts_affine_fast's contract."""
    from . import pallas_ff as PF
    from ..limbs import ints_to_mont_limbs

    curve = E.curve
    n = pay_sorted.shape[0]
    w = PF.SCAN_W
    g = n // w
    assert n % (w * PF.SCAN_LANES) == 0
    ps = pay_sorted.reshape(g, w, N_LIMBS).transpose(1, 2, 0)
    xi, yi = E.offset_point_ints()
    tx = tuple(int(v) for v in ints_to_mont_limbs([xi], curve.field)[0])
    ty = tuple(int(v) for v in ints_to_mont_limbs([yi], curve.field)[0])
    outs = PF.fused_madd_scan_xyzz(curve, (tx, ty), ps)
    inner = tuple(outs[:4])
    totx, toty, totzz, totzzz = (t.T for t in outs[4:8])
    exc = jnp.any(outs[8] != 0)
    totals_t = E.xyzz_to_jacobian(totx, toty, totzz, totzzz)
    totals = E.add(totals_t, E.neg(E.offset_point((g,))))
    tot_prefix = prefix_scan_points(E, totals)
    ident = E.identity((1,))
    offsets = JPoint(
        jnp.concatenate([ident.x, tot_prefix.x[:-1]]),
        jnp.concatenate([ident.y, tot_prefix.y[:-1]]),
        jnp.concatenate([ident.z, tot_prefix.z[:-1]]),
    )
    return inner, offsets, w, exc


def prefix_scan_points_fast(E: EC, p: JPoint, reverse: bool = False):
    """Blinded fast variant of prefix_scan_points: blocked scan over
    exception-flagging generic adds (EC.add_fast, ~15 modmuls vs ~33), block
    carries seeded at T.  Returns (prefix, exc) where every materialized
    prefix value carries EXACTLY ONE T (block totals are un-blinded before
    the offsets recursion) and exc is a scalar bool ORing all flags.
    Identity inputs pass through exactly (empty-bucket slots)."""
    n = p.x.shape[0]
    if n == 1:
        return p, jnp.zeros((), bool)  # single value: true prefix, NOT blinded
    if reverse:
        rev = _take(p, jnp.arange(n - 1, -1, -1))
        out, exc = prefix_scan_points_fast(E, rev, reverse=False)
        return _take(out, jnp.arange(n - 1, -1, -1)), exc
    w = _pick_block_width(n)
    g = -(-n // w)
    p = _pad_pts(E, p, g * w - n)
    cols = JPoint(*(_to_cols(c, g, w) for c in p))

    def step(carry, col):
        pt, ex = carry
        nc, e = E.add_fast(pt, JPoint(*col))
        return (nc, ex | e), nc

    t0 = E.offset_point((g,))
    (totals_t, exc_v), inner = jax.lax.scan(
        step, (t0, jnp.zeros((g,), dtype=bool)), tuple(cols)
    )
    exc = jnp.any(exc_v)
    inner = JPoint(*(_from_cols(c, g, w) for c in inner))
    if g == 1:
        return _take(inner, jnp.arange(n)), exc
    totals = E.add(totals_t, E.neg(E.offset_point((g,))))  # safe un-blind
    tot_prefix = prefix_scan_points(E, totals)  # safe, g elements
    ident = E.identity((1,))
    offsets = JPoint(
        jnp.concatenate([ident.x, tot_prefix.x[:-1]]),
        jnp.concatenate([ident.y, tot_prefix.y[:-1]]),
        jnp.concatenate([ident.z, tot_prefix.z[:-1]]),
    )
    off_b = JPoint(
        jnp.repeat(offsets.x, w, axis=0),
        jnp.repeat(offsets.y, w, axis=0),
        jnp.repeat(offsets.z, w, axis=0),
    )
    full, e2 = E.add_fast(off_b, inner)
    return _take(full, jnp.arange(n)), exc | jnp.any(e2)


def sum_points_fast(E: EC, p: JPoint):
    """Log-halving batch sum over exception-flagging fast adds.  Returns
    (point, exc).  Identity slots pass through; only doubling collisions
    flag (adversarial for blinded inputs)."""
    x, y, z = p
    n = x.shape[0]
    exc = jnp.zeros((), bool)
    while n > 1:
        half = n // 2
        s, e = E.add_fast(
            JPoint(x[:half], y[:half], z[:half]),
            JPoint(x[half:2 * half], y[half:2 * half], z[half:2 * half]),
        )
        exc = exc | jnp.any(e)
        if n % 2:
            x = jnp.concatenate([s.x, x[2 * half:]], axis=0)
            y = jnp.concatenate([s.y, y[2 * half:]], axis=0)
            z = jnp.concatenate([s.z, z[2 * half:]], axis=0)
            n = half + 1
        else:
            x, y, z = s.x, s.y, s.z
            n = half
    return JPoint(x[0], y[0], z[0]), exc


def prefix_scan_points(E: EC, p: JPoint, reverse: bool = False) -> JPoint:
    """Inclusive prefix (or suffix) sums of a (N,) JPoint array under EC
    addition, materialized.  On Pallas-class backends, small sizes use a
    Hillis-Steele log-depth scan — log2(N) full-width batched adds (N log N
    total adds, but only ~12 kernel launches; launch latency dominates the
    tiny compute there).  Larger arrays use the blocked parts decomposition
    (~2.1N adds, work-optimal)."""
    from .. import config as _cfg

    n = p.x.shape[0]
    if n == 1:
        return p
    if reverse:
        rev = _take(p, jnp.arange(n - 1, -1, -1))
        out = prefix_scan_points(E, rev, reverse=False)
        return _take(out, jnp.arange(n - 1, -1, -1))
    if not _cfg.use_pallas() and n <= 64:
        # tiny static sizes (compile checks / unit tests): one sequential
        # scan = ONE compiled add body, instead of the blocked-parts
        # recursion's 3+ distinct EC-add instantiations (XLA:CPU compile
        # time is linear in instantiations; runtime is irrelevant here)
        def step(carry, el):
            nc = E.add(carry, JPoint(*el))
            return nc, nc

        _, out = jax.lax.scan(step, E.identity(()), tuple(p))
        return out
    if _cfg.use_pallas() and n <= (1 << 12):
        d = 1
        while d < n:
            idp = E.identity((d,))
            shifted = JPoint(
                jnp.concatenate([idp.x, p.x[:-d]]),
                jnp.concatenate([idp.y, p.y[:-d]]),
                jnp.concatenate([idp.z, p.z[:-d]]),
            )
            p = E.add(p, shifted)
            d *= 2
        return p
    inner, offsets, w = prefix_scan_parts(E, p)
    g = offsets.x.shape[0]
    if g == 1:
        return _take(inner, jnp.arange(n))
    off_b = JPoint(
        jnp.repeat(offsets.x, w, axis=0),
        jnp.repeat(offsets.y, w, axis=0),
        jnp.repeat(offsets.z, w, axis=0),
    )
    full = E.add(off_b, inner)
    return _take(full, jnp.arange(n))


# ---------------------------------------------------------------------------
# Pippenger
# ---------------------------------------------------------------------------

def _pack_pair(ax, ay):
    """(N, 16) x/y uint32 16-bit-limb arrays -> (N, 16) packed rows
    (two limbs per word, x in cols 0..7, y in cols 8..15): one 64-byte row
    per point keeps the sorted-order gather on the fast side of the TPU
    row-gather cliff.  The affine identity (0, 0) stays all-zero."""
    def pack(v):
        return v[:, 0::2] | (v[:, 1::2] << 16)
    return jnp.concatenate([pack(ax), pack(ay)], axis=1)


def _unpack_pair(rows):
    """(M, 16) packed rows -> (sx, sy) (M, 16) 16-bit-limb arrays."""
    def unpack(v):
        return jnp.stack([v & 0xFFFF, v >> 16], axis=2).reshape(v.shape[0], 16)
    return unpack(rows[:, :8]), unpack(rows[:, 8:16])


def window_digits(scalars, c: int, num_windows: int):
    """Extract c-bit windows from (N, 16) uint32 scalar limb arrays.
    Returns (num_windows, N) int32 bucket ids.

    A c-bit window (c <= 16) spans at most two 16-bit limbs, so each window
    is two shifts + an or + a mask — not c single-bit extractions."""
    assert c <= LIMB_BITS
    total_bits = N_LIMBS * LIMB_BITS
    mask = np.uint32((1 << c) - 1)
    out = []
    for w in range(num_windows):
        lo_bit = w * c
        limb = lo_bit // LIMB_BITS
        off = lo_bit % LIMB_BITS
        if lo_bit >= total_bits:
            out.append(jnp.zeros((scalars.shape[0],), dtype=jnp.int32))
            continue
        acc = scalars[:, limb] >> off
        if off + c > LIMB_BITS and limb + 1 < N_LIMBS:
            acc = acc | (scalars[:, limb + 1] << (LIMB_BITS - off))
        out.append((acc & mask).astype(jnp.int32))
    return jnp.stack(out)


def bucket_bounds_hist(digits_w, c: int):
    """hi[b] = (#digits <= b) - 1 for b in [0, 2^c): the right boundary of
    every bucket's run in the sorted order.  Computed as an EXACT one-hot
    matmul histogram on the MXU — counts are integers < 2^24, exact in f32 —
    followed by a cumulative sum.  Replaces jnp.searchsorted over the sorted
    keys, whose ~log2(N) sequential gather rounds were a top-4 cost in the
    MSM window loop; this needs no sorted input at all."""
    lo_bits = min(c, 8)
    hbits = c - lo_bits
    lo = (digits_w & ((1 << lo_bits) - 1)).astype(jnp.int32)
    hi_part = (digits_w >> lo_bits).astype(jnp.int32)
    a = jax.nn.one_hot(hi_part, 1 << hbits, dtype=jnp.bfloat16)  # (N, H)
    b = jax.nn.one_hot(lo, 1 << lo_bits, dtype=jnp.bfloat16)     # (N, L)
    counts = jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (H, L); flat index h * L + l == digit value
    return jnp.cumsum(counts.reshape(-1)).astype(jnp.int32) - 1


def pick_window(n: int) -> int:
    """Window size heuristic.  Per-window cost here is ~N mixed adds for the
    sorted prefix scan plus ~6*2^c adds for boundary queries + bucket
    reduction, so the optimum sits near log2(N) - 5 (flat within +-1)."""
    if n < 4:
        return 1
    return min(max(int(math.log2(n)) - 5, 1), 16)


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
    if isinstance(scalars, jax.core.Tracer) or isinstance(pts.x, jax.core.Tracer):
        # traced caller (shard_map / jit): the exception fallback must stay
        # in-graph as a lax.cond
        return _best_multiexp_jit(curve, c, bits, wb, "cond", scalars, pts)
    # un-traced entry: run the fast-only executable (half the compiled graph)
    # and host-check the exception flag; the safe executable is only ever
    # traced+compiled if an exception actually fires (adversarial inputs
    # aligned with the blinding point — never for honest ones)
    res, exc = _best_multiexp_jit(curve, c, bits, wb, "fast", scalars, pts)
    if bool(jax.device_get(exc)):
        return _best_multiexp_jit(curve, c, bits, wb, "safe", scalars, pts)
    return res


def _make_one_window(E: EC, c: int, flavor: str, pay, n: int):
    """Build the per-window bucket-sum closure shared by best_multiexp and
    the argument's per-round digit sums (each Eagen round IS one Pippenger
    window: S_k = sum_j d_kj * P_j with d_kj < base <= 2^c).

    pay: (N, 16) packed affine rows (_pack_pair); returns one_window(keys_in)
    mapping (N,) int32 keys in [0, 2^c) to sum_b b * B_b — a point for
    "cond"/"safe" flavors, (point, exc) for "fast"."""

    def window_from_scan_safe(hi, inner, offsets, w):
        """Bucket sums + triangle reduction from a prefix-scan decomposition,
        all complete (safe) adds.  hi[b] (right boundary of bucket b's sorted
        run; -1 if empty prefix) serves both ends of every range: for integer
        keys the left boundary of bucket b is the right boundary of b-1."""

        def pref_at(idx):
            # prefix[i] = offsets[i // w] + inner[i], queried at O(2^c)
            # boundary positions only (the full array is never built)
            safe = jnp.maximum(idx, 0)
            pt = E.add(_take(offsets, safe // w), _take(inner, safe))
            return E.select(idx >= 0, pt, E.identity(idx.shape))

        pref = pref_at(hi)  # (2^c,) prefix sums at bucket right boundaries
        bucket = E.add(
            _take(pref, slice(1, None)), E.neg(_take(pref, slice(0, -1)))
        )  # (2^c - 1,) bucket sums for b = 1 .. 2^c-1
        # pad to 2^c with identity (exact under complete adds): power-of-two
        # shapes share one EC-add trace across scan/sum call sites instead
        # of instantiating fresh kernel bodies at 2^c - 1 (compile time)
        bucket = _pad_pts(E, bucket, _pow2_pad(bucket.x.shape[0]))
        sfx = prefix_scan_points(E, bucket, reverse=True)
        return E.sum(sfx, axis=0)

    def bucket_diffs_fast(hi, inner_at, offsets, w):
        """Bucket sums (b = 1 .. 2^c-1) from a BLINDED scan decomposition
        (every prefix carries exactly one T; the empty prefix IS T, so
        bucket differences are TRUE values).  `inner_at(idx)` gives the XYZZ
        4-tuple of inner prefixes at positions idx; only the O(2^c) queried
        values are converted to Jacobian.  Returns (bucket, exc)."""
        base = E.offset_point(())

        def pref_at(idx):
            safe = jnp.maximum(idx, 0)
            iq = E.xyzz_to_jacobian(*inner_at(safe))
            pt, e = E.add_fast(_take(offsets, safe // w), iq)
            basep = JPoint(*(jnp.broadcast_to(cc, idx.shape + (N_LIMBS,))
                             for cc in base))
            return E.select(idx >= 0, pt, basep), jnp.any(e)

        pref, e1 = pref_at(hi)
        bucket, e2 = E.add_fast(
            _take(pref, slice(1, None)), E.neg(_take(pref, slice(0, -1)))
        )
        return bucket, e1 | jnp.any(e2)

    def triangle_fast(bucket):
        """sum_b b * B_b via the suffix-scan triangle, re-blinded fast scans;
        the accumulated (2^c - 1) copies of T are cancelled with one
        precomputed [2^c-1]T.  Returns (point, exc)."""
        nb = bucket.x.shape[0]  # static: 2^c - 1
        if nb > 64:
            # pad to 2^c: the blinded suffix scan and the complete-add final
            # sum then run at power-of-two shapes shared with the other
            # blocked scans (one EC-add trace instead of log2 fresh bodies).
            # Identity slots pass through add_fast unflagged and carry
            # exactly one T each, so the [nb]T un-blind below stays exact
            # with nb = the PADDED count.
            bucket = _pad_pts(E, bucket, _pow2_pad(nb))
            nb = bucket.x.shape[0]
        if nb <= 64:
            # small windows (the argument's base-ary digit rounds): the
            # complete-add triangle is as cheap as the blinded one at this
            # size and immune to the T+T collisions an ALL-EMPTY bucket
            # table produces systematically (the spare most-significant
            # digit round of the negbase decomposition is all zeros, so
            # every suffix equals T and the blinded halving sum doubles)
            sfx = prefix_scan_points(E, bucket, reverse=True)
            return E.sum(sfx, axis=0), jnp.zeros((), bool)
        sfx, e3 = prefix_scan_points_fast(E, bucket, reverse=True)
        # the final halving sum uses COMPLETE adds: runs of empty top
        # buckets (any window whose digits don't fill c bits — e.g. the
        # most-significant window of a full-width MSM) make long runs of
        # sfx equal exactly T, and a blinded halving sum would pair equal
        # values into systematic doubling exceptions.  ~33 x 2^c modmuls,
        # ~3% of window time — robustness is worth it.
        s = E.sum(sfx, axis=0)
        if nb > 1:
            s = E.add(s, E.neg(E.offset_point((), mult=nb)))  # safe un-blind
        return s, e3

    def window_from_scan_fast(hi, inner_at, offsets, w):
        bucket, e1 = bucket_diffs_fast(hi, inner_at, offsets, w)
        s, e2 = triangle_fast(bucket)
        return s, e1 | e2

    def scan_packed_padded(rows, n_rows):
        """Blinded fused-kernel scan over packed rows, zero-padded to the
        pallas scan unit (zero rows are affine identities and pass through);
        returns (inner_at, offsets, w, exc)."""
        from . import pallas_ff as PF

        unit = PF.SCAN_W * PF.SCAN_LANES
        pad = -n_rows % unit
        if pad:
            rows = jnp.concatenate(
                [rows, jnp.zeros((pad, rows.shape[1]), rows.dtype)]
            )
        inner, offsets, w, exc = prefix_scan_parts_packed_fast(E, rows)

        def inner_at(safe):
            return tuple(cc[safe % w, :, safe // w] for cc in inner)

        return inner_at, offsets, w, exc

    def radix_plan():
        """Static decision: route this window's reorder through the MXU
        radix shuffle (ops/radix.py) instead of sort+gather.  The shuffle
        needs tiles of 4096 rows and enough key bits for its coarse split;
        below 2^17 rows the gather it replaces is no longer the dominant
        cost and the fixed pass overheads lose."""
        from .. import config as _cfg
        from . import radix as RX

        if not _cfg.use_pallas() or not _cfg.use_radix_msm() \
                or flavor == "safe":
            return None
        if n < (1 << 17) or n % 4096 != 0 or c < 8:
            return None
        return RX.make_plan(n, c)

    plan = radix_plan()

    def one_window(keys_in):
        from . import pallas_ff as PF
        from . import radix as RX
        from .. import config as _cfg

        def classic_rows_hi():
            _, order = jax.lax.sort_key_val(
                keys_in, jnp.arange(n, dtype=jnp.int32))
            return pay[order], bucket_bounds_hist(keys_in, c)

        def safe_path(_):
            rows, hi = classic_rows_hi()
            sx, sy = _unpack_pair(rows)
            # affine identity (0, 0) <=> all-zero y row (prime-order curves)
            sid = (jnp.sum((sy != 0).astype(jnp.int32), axis=1) == 0)
            inner_s, offsets_s, ws = prefix_scan_parts_affine(E, sx, sy, sid)
            return window_from_scan_safe(hi, inner_s, offsets_s, ws)

        # the blinded fast path is a throughput feature; at statically tiny N
        # (compile checks, unit tests) the safe path alone wins AND avoids
        # compiling both lax.cond branches — that halves an already large
        # limb-arithmetic graph, which matters for the multi-chip CPU dry run
        if flavor == "safe" or n < 64:
            return safe_path(None) if flavor == "cond" or flavor == "safe" \
                else (safe_path(None), jnp.zeros((), bool))

        if plan is not None:
            # MXU radix shuffle: bucket-contiguous stream without per-row
            # gathers (docs/DESIGN-mxu-gather.md).  Spilled rows (~1.5%) are
            # reordered by the classic tiny sort+gather and their bucket
            # sums merged in before the triangle; any tile overflowing its
            # spill capacity flags `exc` -> exact fallback.
            sorted_pay, hi_r, spill_pay, spill_keys, overflow = \
                RX.radix_window(plan, keys_in, pay)
            inner_at, offsets, w, exc = scan_packed_padded(
                sorted_pay, plan.n_ext)
            bucket_m, e_m = bucket_diffs_fast(hi_r, inner_at, offsets, w)

            ns = spill_keys.shape[0]
            _, sorder = jax.lax.sort_key_val(
                spill_keys, jnp.arange(ns, dtype=jnp.int32))
            srows = spill_pay[sorder]
            shi = bucket_bounds_hist(spill_keys, c)
            sin_at, soff, sw, s_exc = scan_packed_padded(srows, ns)
            bucket_s, e_s = bucket_diffs_fast(shi, sin_at, soff, sw)

            # elementwise merge: both tables hold TRUE values (empty buckets
            # are exact identities and pass through add_fast unflagged)
            bucket, e_c = E.add_fast(bucket_m, bucket_s)
            fast, e_t = triangle_fast(bucket)
            exc2 = (overflow | exc | e_m | s_exc | e_s
                    | jnp.any(e_c) | e_t)
        else:
            rows, hi = classic_rows_hi()
            if _cfg.use_pallas() and n % (PF.SCAN_W * PF.SCAN_LANES) == 0:
                inner_at, offsets, w, exc = scan_packed_padded(rows, n)
            else:
                sx, sy = _unpack_pair(rows)
                inner, offsets, w, exc = prefix_scan_parts_affine_fast(
                    E, sx, sy)

                def inner_at(safe):
                    return tuple(cc[safe] for cc in inner)
            fast, e_w = window_from_scan_fast(hi, inner_at, offsets, w)
            exc2 = exc | e_w

        if flavor == "fast":
            return fast, exc2
        # exceptions are impossible unless inputs align with the blinding
        # point (or, for tiny inputs, empty-bucket suffix collisions); the
        # safe recompute keeps the result exact in every case
        return jax.lax.cond(exc2, safe_path, lambda _: fast, None)

    return one_window


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _best_multiexp_jit(
    curve: CurveSpec, c: int, total_bits: int, window_batch: int, flavor: str,
    scalars, pts: JPoint,
):
    """flavor:
      "cond" — fast path with an in-graph lax.cond safe fallback per window
               (exact for every input; both branches compiled; used when the
               caller is itself traced, e.g. under shard_map)
      "fast" — fast path only; returns (point, exc_any).  The caller host-
               checks exc_any and reruns "safe" — halves the compiled graph
               and the cold-compile bill, and the safe executable only ever
               compiles if an exception actually fires (adversarial inputs)
      "safe" — complete-add path only; returns the exact point
    """
    E = ec(curve)
    n = scalars.shape[0]
    num_windows = -(-total_bits // c)
    # the top window only spans the modulus' leftover bits: treating it as a
    # full c-bit window wastes 2^c-sized bucket machinery on mostly-empty
    # buckets AND (for the radix reorder) crowds the coarse partitions into
    # half the slot space — give it its own effective width instead
    c_top = total_bits - (num_windows - 1) * c  # in (0, c]
    digits = window_digits(scalars, c, num_windows)  # (W, N) int32

    # normalize the input points ONCE (shared batch inversion): every window's
    # dominant scan then runs on mixed (Jacobian + affine) additions.
    # The per-window sorted-order gather moves ONE (N, 16) uint32 row per
    # point with both coordinates' 16-bit limbs packed two per word: TPU row
    # gathers cost per-INDEX up to 64-byte rows (measured v5e: one packed
    # 64 B gather 7.7 ms at 2^20 vs 14.6 ms for the two-array form and
    # 42 ms for 128 B rows), so packing halves the dominant window stage.
    ax, ay, aident = E.to_affine(pts)
    pay = _pack_pair(ax, ay)  # (N, 16) uint32
    from .. import config as _cfg

    one_window = _make_one_window(E, c, flavor, pay, n)
    # Splitting the top window to its natural width c_top saves ~half of ONE
    # window's bucket-phase work (a few ms at 2^20) but re-instantiates the
    # ENTIRE bucket machinery at a second static width — ~5 fresh unrolled
    # EC-kernel body traces, ~1 min of cold compile (tools/trace_census.py).
    # Only worth it for the radix reorder, whose coarse partitions genuinely
    # need the narrower key space (see radix_plan's docstring).
    # mirror radix_plan's FULL viability predicate (incl. for the c_top
    # width): when the plan would be rejected anyway (n not tile-aligned,
    # width < 8) the split would re-instantiate the bucket machinery at a
    # second static width for nothing — ~1 min of cold compile with zero
    # radix benefit (ADVICE r4)
    split_top = (c_top < c and num_windows > 1 and _cfg.use_pallas()
                 and _cfg.use_radix_msm() and flavor != "safe"
                 and n >= (1 << 17) and n % 4096 == 0
                 and c >= 8 and c_top >= 8)
    digits_main = digits[:-1] if split_top else digits

    if _cfg.use_pallas():
        # sequential windows: the pallas kernels inside prefer plain shapes
        # (each step is already a full-width batched kernel)
        window_sums = jax.lax.map(one_window, digits_main)
    elif window_batch >= num_windows:
        window_sums = jax.vmap(one_window)(digits_main)  # (W,) point batch
    else:
        window_sums = jax.lax.map(one_window, digits_main,
                                  batch_size=window_batch)

    if split_top:
        top = _make_one_window(E, c_top, flavor, pay, n)(digits[-1])
        window_sums = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b[None]]), window_sums, top)

    exc_any = None
    if flavor == "fast":
        window_sums, excs = window_sums
        exc_any = jnp.any(excs)

    def fold(i, acc):
        acc = _double_n(E, acc, c)
        g = _take(window_sums, num_windows - 1 - i)
        return E.add(acc, g)

    res = jax.lax.fori_loop(0, num_windows, fold, E.identity(()))
    if flavor == "fast":
        if exc_any is None:
            exc_any = jnp.zeros((), bool)
        return res, exc_any
    return res


@partial(jax.jit, static_argnums=(0, 1, 2))
def _round_sums_jit(curve: CurveSpec, base: int, flavor: str, digits, pts: JPoint):
    """Per-round digit-weighted sums for the Eagen argument's carry
    recurrence (reference argument_witness_calc.rs:96-127): each round k is
    ONE Pippenger window over base-ary digits, S_k = sum_j digits[k,j] * P_j.

    digits: (d, N) int32 in [0, base); pts: (N,).  Returns a (d,) JPoint
    batch ("cond"/"safe") or ((d,) JPoint, exc_any) for "fast".  Reuses the
    MSM's sort + blinded-prefix-scan window machinery — ~window-of-an-MSM
    cost per round instead of an N-point complete-add tree reduction."""
    E = ec(curve)
    n = pts.x.shape[0]
    c = max(1, (base - 1).bit_length())
    ax, ay, _ = E.to_affine(pts)
    pay = _pack_pair(ax, ay)
    one_window = _make_one_window(E, c, flavor, pay, n)
    out = jax.lax.map(one_window, digits)
    if flavor == "fast":
        sums, excs = out
        return sums, excs  # PER-ROUND flags (d,)
    return out


def round_sums(curve: CurveSpec, base: int, digits, pts: JPoint):
    """Host entry: fast flavor with host-checked exception fallback (same
    contract as best_multiexp — exact for every input).  Only the FLAGGED
    rounds are recomputed in the safe flavor (a single flagged round used to
    trigger a ~d-fold safe rerun of everything).  Traced callers get the
    in-graph lax.cond flavor."""
    if isinstance(digits, jax.core.Tracer) or isinstance(pts.x, jax.core.Tracer):
        return _round_sums_jit(curve, base, "cond", digits, pts)
    sums, excs = _round_sums_jit(curve, base, "fast", digits, pts)
    flags = np.asarray(jax.device_get(excs))
    if flags.any():
        idx = np.nonzero(flags)[0]
        safe = _round_sums_jit(curve, base, "safe", digits[jnp.asarray(idx)],
                               pts)
        ii = jnp.asarray(idx)
        sums = JPoint(
            sums.x.at[ii].set(safe.x),
            sums.y.at[ii].set(safe.y),
            sums.z.at[ii].set(safe.z),
        )
    return sums


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
