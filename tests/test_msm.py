"""Pippenger MSM vs the exact Python oracle (role of the reference's
best_multiexp oracle tests, argument_witness_calc.rs:138-148)."""

import pytest

from halo2_liam_eagen_msm_tpu.fields import GRUMPKIN, PALLAS
from halo2_liam_eagen_msm_tpu.ops.msm import msm_ints, pick_window
from halo2_liam_eagen_msm_tpu.utils import pyref


@pytest.mark.parametrize("curve", [PALLAS, GRUMPKIN], ids=lambda c: c.name)
def test_msm_small(curve, rng):
    q = curve.scalar_field.p
    n = 16
    pts = pyref.random_points(rng, curve, n)
    scalars = [rng.randrange(q) for _ in range(n)]
    # edges: zero scalar, one scalar, q-1, identity point
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = q - 1
    pts[3] = None
    got = msm_ints(curve, scalars, pts, c=8)  # full 255-bit windows
    want = pyref.ec_msm(scalars, pts, curve)
    assert got == want


def test_msm_single_and_tiny(rng):
    curve = PALLAS
    q = curve.scalar_field.p
    pts = pyref.random_points(rng, curve, 1)
    s = [rng.randrange(1 << 64)]
    assert msm_ints(curve, s, pts, c=4, max_scalar_bits=64) == pyref.ec_msm(s, pts, curve)
    # all-zero scalars -> identity
    assert msm_ints(curve, [0, 0], pyref.random_points(rng, curve, 2), c=4,
                    max_scalar_bits=64) is None


def test_msm_larger_batch(rng):
    curve = PALLAS
    q = curve.scalar_field.p
    n = 64
    pts = pyref.random_points(rng, curve, n)
    scalars = [rng.randrange(1 << 64) for _ in range(n)]
    # duplicate points (forces the doubling path inside bucket accumulation)
    pts[10] = pts[11] = pts[12]
    got = msm_ints(curve, scalars, pts, c=8, max_scalar_bits=64)
    want = pyref.ec_msm(scalars, pts, curve)
    assert got == want


def test_pick_window():
    assert pick_window(2) == 1
    assert pick_window(1 << 16) == 11
    assert pick_window(1 << 20) == 15
