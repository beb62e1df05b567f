"""Jacobian EC kernel tests vs the exact Python affine oracle (utils/pyref).

Covers the group-law edge cases the reference leans on: identity operands,
doubling via add, inverse pairs -> identity
(/root/reference/src/regular_functions_utils.rs:319-331)."""

import jax
import numpy as np
import pytest

from halo2_liam_eagen_msm_tpu.fields import GRUMPKIN, PALLAS
from halo2_liam_eagen_msm_tpu.ops.ec import ec
from halo2_liam_eagen_msm_tpu.utils import pyref

CURVES = [PALLAS, GRUMPKIN]


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_add_double_neg(curve, rng):
    E = ec(curve)
    n = 16
    pts1 = pyref.random_points(rng, curve, n)
    pts2 = pyref.random_points(rng, curve, n)
    # edge cases: identity operands, equal points (doubling), inverse pairs
    pts1[0] = None
    pts2[1] = None
    pts1[2] = None; pts2[2] = None
    pts2[3] = pts1[3]                       # P + P
    pts2[4] = pyref.ec_neg(pts1[4], curve)  # P + (-P)

    a = E.points_from_ints(pts1)
    b = E.points_from_ints(pts2)
    got = E.points_to_ints(jax.jit(E.add)(a, b))
    want = [pyref.ec_add(p, q, curve) for p, q in zip(pts1, pts2)]
    assert got == want

    got_dbl = E.points_to_ints(jax.jit(E.double)(a))
    want_dbl = [pyref.ec_add(p, p, curve) for p in pts1]
    assert got_dbl == want_dbl

    got_neg = E.points_to_ints(E.neg(a))
    assert got_neg == [pyref.ec_neg(p, curve) for p in pts1]


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_add_mixed(curve, rng):
    E = ec(curve)
    f = E.f
    n = 12
    pts1 = pyref.random_points(rng, curve, n)
    pts2 = pyref.random_points(rng, curve, n)
    pts1[0] = None
    pts2[1] = None
    pts2[2] = pts1[2]
    pts2[3] = pyref.ec_neg(pts1[3], curve)

    a = E.points_from_ints(pts1)
    bq = E.points_from_ints(pts2)
    qx, qy, qid = E.to_affine(bq)
    got = E.points_to_ints(jax.jit(E.add_mixed)(a, qx, qy, qid))
    want = [pyref.ec_add(p, q, curve) for p, q in zip(pts1, pts2)]
    assert got == want


def test_scalar_mul_small_and_sum(rng):
    curve = PALLAS
    E = ec(curve)
    pts = pyref.random_points(rng, curve, 33)
    pts[7] = None
    a = E.points_from_ints(pts)
    for k in (0, 1, 2, 5, 11):
        got = E.points_to_ints(E.scalar_mul_small(a, k))
        assert got == [pyref.ec_mul(p, k, curve) if p else None for p in pts]

    s = E.sum(a)
    got = E.points_to_ints(
        type(a)(s.x[None], s.y[None], s.z[None])
    )[0]
    want = None
    for p in pts:
        want = pyref.ec_add(want, p, curve)
    assert got == want


def test_eq_and_projective(rng):
    curve = PALLAS
    E = ec(curve)
    pts = pyref.random_points(rng, curve, 4) + [None]
    a = E.points_from_ints(pts)
    # eq must hold across Jacobian rescaling: (l^2 X, l^3 Y, l Z)
    f = E.f
    l = f.const(12345)
    b = type(a)(
        f.mul(a.x, f.sqr(l)), f.mul(a.y, f.mul(l, f.sqr(l))), f.mul(a.z, l)
    )
    assert bool(np.asarray(E.eq(a, b)).all())
