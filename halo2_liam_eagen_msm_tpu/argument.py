"""Liam Eagen MSM argument witness orchestration (the reference's core entry
point `compute_lhs_witness`, /root/reference/src/argument_witness_calc.rs:87-136;
paper https://eprint.iacr.org/2022/596 pp. 8-9).

Semantics preserved exactly (digit streams, carry recurrence, per-round point
multisets, final carry == MSM result); TPU-native restructuring:

  * the d ~ 55 digit rounds are BATCHED: one (d, S)-shaped divisor-witness
    call instead of d sequential witness computations (the divisor engine is
    level-synchronous and vmaps over rounds for free)
  * per-round point lists get FIXED SLOTS (base carry slots + N digit slots +
    1 closing slot) with identity masking where the reference omits entries
    (zero digits :121-123, zero carry :112-116) — identity slots merge in as
    the constant-1 propagation, so the witness divisor is unchanged
  * the carry recurrence (:112-127) is a lax.scan over rounds; the per-round
    digit-point sums feeding it are fully parallel masked gathers + batched
    point sums

The returned carry equals sum_i s_i * P_i and is oracle-checked against
best_multiexp in tests, mirroring lhs_test (:138-148).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .fields import CurveSpec, FieldSpec, N_LIMBS
from .limbs import ints_to_limbs
from .negbase import negbase_decompose_batch
from .divisor import RF, compute_divisor_witness_partial
from .ops.ec import EC, JPoint, ec


# ---------------------------------------------------------------- host utils

def order(spec: FieldSpec) -> int:
    """Field modulus (reference order::<F>() :54-56)."""
    return spec.p


def logb_ceil(x: int, base: int) -> int:
    """Count of base-divisions to reach 0 (reference :32-40)."""
    i = 0
    while x > 0:
        x //= base
        i += 1
    return i


def num_digits_for(curve: CurveSpec, base: int) -> int:
    """d = logb_ceil(sqrt(p)+2, base) + 1 (reference :90-91)."""
    sq_p = math.isqrt(order(curve.scalar_field)) + 2
    return logb_ceil(sq_p, base) + 1


def gen_random_coeff(rng, spec: FieldSpec) -> int:
    """Random scalar < sqrt(p) (reference gen_random_coeff :65-79)."""
    return rng.randrange(math.isqrt(spec.p))


def felt_from_u64(spec: FieldSpec, x: int):
    """u64 -> field element limbs (reference felt_from_u64 :59-61)."""
    assert 0 <= x < (1 << 64)
    return ints_to_limbs([x % spec.p])[0]


# ------------------------------------------------------------- device pieces

def precompute_multiplicities(E: EC, pts: JPoint, base: int) -> JPoint:
    """Multiplicities 1*P .. (base-1)*P per point by repeated addition
    (reference :43-51).  pts: (N,) -> (base-1, N) stacked JPoint."""
    if base == 2:
        return JPoint(pts.x[None], pts.y[None], pts.z[None])
    # lax.scan so the repeated-add body compiles once (base - 2 unrolled adds
    # would each be a fresh EC-add instantiation — expensive XLA:CPU compile)
    def step(acc, _):
        nxt = E.add(acc, pts)
        return nxt, nxt

    _, rest = jax.lax.scan(step, pts, None, length=base - 2)
    return JPoint(
        jnp.concatenate([pts.x[None], rest.x]),
        jnp.concatenate([pts.y[None], rest.y]),
        jnp.concatenate([pts.z[None], rest.z]),
    )


@partial(jax.jit, static_argnums=(0, 1))
def _rounds_and_carries(curve: CurveSpec, base: int, digits, pts: JPoint):
    """Given digits (d, N) int32 (msb-first rounds) and pts (N,), build the
    per-round slotted point tensors (d, S) and the carry sequence.

    Returns (round_pts: JPoint (d, S), final_carry: JPoint)."""
    E = ec(curve)
    d, n = digits.shape

    precomp = precompute_multiplicities(E, pts, base)  # (base-1, N)

    # digit-selected points per (round, j): gather along the multiplicity axis
    idx = jnp.clip(digits - 1, 0, base - 2)  # (d, N)
    zero_digit = digits == 0
    cols = jnp.arange(n)[None, :]
    sel = JPoint(
        precomp.x[idx, cols],
        precomp.y[idx, cols],
        precomp.z[idx, cols],
    )
    # mask zero digits to the identity
    sel = JPoint(
        sel.x, sel.y, jnp.where(zero_digit[..., None], 0, sel.z)
    )

    # per-round digit-point sums (parallel over rounds)
    s_round = E.sum(sel, axis=1)  # (d,) JPoint

    # carry recurrence: carry' = -carry * base + S_i  (reference :112-127)
    def step(carry, s_i):
        c1 = E.scalar_mul_small(E.neg(carry), base)
        new = E.add(c1, JPoint(*s_i))
        return new, (carry, new)

    init = E.identity(())
    final_carry, (carry_prev, carry_new) = jax.lax.scan(
        step, init, tuple(s_round)
    )

    # assemble slotted round lists: [base x (-carry_prev)] + digit slots + [-carry_new]
    neg_prev = E.neg(carry_prev)   # (d,)
    # the reference omits the carry slots when carry_prev is the identity;
    # -identity IS the identity, so the mask is automatic
    carry_slots = JPoint(
        jnp.repeat(neg_prev.x[:, None, :], base, axis=1),
        jnp.repeat(neg_prev.y[:, None, :], base, axis=1),
        jnp.repeat(neg_prev.z[:, None, :], base, axis=1),
    )
    neg_new = E.neg(carry_new)
    closing = JPoint(neg_new.x[:, None, :], neg_new.y[:, None, :], neg_new.z[:, None, :])
    round_pts = JPoint(
        jnp.concatenate([carry_slots.x, sel.x, closing.x], axis=1),
        jnp.concatenate([carry_slots.y, sel.y, closing.y], axis=1),
        jnp.concatenate([carry_slots.z, sel.z, closing.z], axis=1),
    )
    return round_pts, final_carry


@partial(jax.jit, static_argnums=(0, 1))
def _carry_scan(curve: CurveSpec, base: int, sx, sy, sz):
    """Fold the (d,) round sums through carry' = -carry*base + S_i
    (reference argument_witness_calc.rs:112-127).  Cheap: d ~ 56 points."""
    E = ec(curve)
    def step(carry, s_i):
        c1 = E.scalar_mul_small(E.neg(carry), base)
        new = E.add(c1, JPoint(*s_i))
        return new, (carry, new)

    final, (carry_prev, carry_new) = jax.lax.scan(
        step, E.identity(()), (sx, sy, sz)
    )
    return carry_prev, carry_new, final


def _carries_only(curve: CurveSpec, base: int, digits, pts: JPoint):
    """Carry recurrence WITHOUT materializing the (d, S) slot tensor — the
    production-scale path (at N = 2^20 the full tensor is ~11 GB; BASELINE
    config 4).  Each per-round digit sum is ONE Pippenger window
    (ops/msm.round_sums: sort + blinded fused prefix scan + bucket diffs)
    instead of an N-point complete-add tree — ~300x less device time at
    2^18 than the gather+log-halving reduction it replaces.
    Returns (carry_prev (d,), carry_new (d,), final)."""
    from .ops.msm import round_sums
    s_round = round_sums(curve, base, digits, pts)
    return _carry_scan(curve, base, s_round.x, s_round.y, s_round.z)


@partial(jax.jit, static_argnums=(0, 1))
def _one_round_slots(curve: CurveSpec, base: int, digits_k, precomp: JPoint,
                     carry_prev, carry_new):
    """One round's slotted point list (S,) = [base x (-carry_prev)] + digit
    slots + [-carry_new] — the streaming counterpart of _rounds_and_carries'
    assembly, identical slot semantics.  precomp: (base-1, N) multiplicity
    table (computed once by the caller; ~3 full-width EC adds per reuse
    saved)."""
    E = ec(curve)
    n = precomp.x.shape[1]
    cols = jnp.arange(n)
    idx = jnp.clip(digits_k - 1, 0, base - 2)
    sel = JPoint(
        precomp.x[idx, cols], precomp.y[idx, cols],
        jnp.where((digits_k == 0)[:, None], 0, precomp.z[idx, cols]),
    )
    neg_prev = E.neg(carry_prev)
    neg_new = E.neg(carry_new)
    return JPoint(
        jnp.concatenate([jnp.repeat(neg_prev.x[None], base, 0), sel.x,
                         neg_new.x[None]]),
        jnp.concatenate([jnp.repeat(neg_prev.y[None], base, 0), sel.y,
                         neg_new.y[None]]),
        jnp.concatenate([jnp.repeat(neg_prev.z[None], base, 0), sel.z,
                         neg_new.z[None]]),
    )


def compute_lhs_witness_streamed(curve: CurveSpec, scalars, pts: JPoint,
                                 base: int, round_callback):
    """Production-scale compute_lhs_witness: the d digit rounds are computed
    ONE AT A TIME (peak memory = one round's merge tree instead of d of
    them), each passed to `round_callback(k, wtns_k, out_k)`.  Rounds arrive
    msb-first (reference round order BEFORE its final reversal, :132).
    Returns the final carry (== sum_i s_i P_i, oracle-checked in tests)."""
    from .divisor import compute_divisor_witness_partial

    E = ec(curve)
    n = pts.x.shape[0]
    assert len(scalars) == n, "incompatible amount of coefficients"
    sq_p = math.isqrt(order(curve.scalar_field)) + 2
    for s in scalars:
        assert 0 <= s < sq_p, "scalar out of range"
    d = num_digits_for(curve, base)
    digits = negbase_decompose_batch(ints_to_limbs(scalars), base, d)
    digits_msb = jnp.asarray(digits[:, ::-1].T.astype(np.int32))  # (d, N)

    carry_prev, carry_new, final = _carries_only(curve, base, digits_msb, pts)
    precomp = jax.jit(lambda p: precompute_multiplicities(E, p, base))(pts)
    for k in range(d):
        rp = _one_round_slots(
            curve, base, digits_msb[k], precomp,
            JPoint(carry_prev.x[k], carry_prev.y[k], carry_prev.z[k]),
            JPoint(carry_new.x[k], carry_new.y[k], carry_new.z[k]),
        )
        wtns_k, out_k = compute_divisor_witness_partial(curve, rp)
        round_callback(k, wtns_k, out_k)
    return final


def compute_lhs_witness(
    curve: CurveSpec,
    scalars,
    pts: JPoint,
    base: int,
):
    """The core function (reference :87-136): per digit-round regular
    functions witnessing the LHS of Eagen's argument.

    scalars: list of host ints, each in [0, sqrt(p)+2) — range-checked like
    the reference (:97); pts: (N,) JPoint.

    Returns (carry: JPoint, witness: RF with leading dim d, round_pts).
    witness[k] is the round for digit position k with the same ordering as
    the reference's returned Vec (LSB round first, :132)."""
    E = ec(curve)
    n = pts.x.shape[0]
    assert len(scalars) == n, "incompatible amount of coefficients"
    sq_p = math.isqrt(order(curve.scalar_field)) + 2
    for s in scalars:
        assert 0 <= s < sq_p, "scalar out of range"
    d = num_digits_for(curve, base)

    digits = negbase_decompose_batch(ints_to_limbs(scalars), base, d)  # (N, d) le
    digits_msb = digits[:, ::-1].T.astype(np.int32)  # (d, N) msb-first rounds

    round_pts, carry = _rounds_and_carries(
        curve, base, jnp.asarray(digits_msb), pts
    )
    wtns, outs = compute_divisor_witness_partial(curve, round_pts)
    # every round's points sum to zero by construction
    if not bool(np.asarray(ec(curve).is_identity(outs)).all()):
        raise AssertionError("divisor round does not close to the identity")
    # reference returns rounds reversed (LSB digit first, :132)
    wtns = RF(wtns.a[::-1], wtns.b[::-1])
    return carry, wtns, round_pts
