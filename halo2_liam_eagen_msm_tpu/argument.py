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
