"""C++ oracle cross-checks: three independent implementations must agree
bit-exactly (C++ 4x64 Montgomery vs Python ints vs JAX 16x16 limbs) —
BASELINE config 1's bit-exactness requirement."""

import shutil

import numpy as np
import pytest

from halo2_liam_eagen_msm_tpu.fields import GRUMPKIN, PALLAS, PALLAS_FP

pytestmark = [
    pytest.mark.skipif(shutil.which("g++") is None, reason="no g++"),
    pytest.mark.fast,
]


@pytest.fixture(scope="module")
def orc():
    from halo2_liam_eagen_msm_tpu import oracle

    oracle.build()
    return oracle


def test_ff_ops(orc, rng):
    spec = PALLAS_FP
    xs = [rng.randrange(spec.p) for _ in range(64)]
    ys = [rng.randrange(spec.p) for _ in range(64)]
    xs[:2] = [0, spec.p - 1]
    ys[:2] = [spec.p - 1, spec.p - 1]
    assert orc.ff_mul(spec, xs, ys) == [x * y % spec.p for x, y in zip(xs, ys)]
    assert orc.ff_add(spec, xs, ys) == [(x + y) % spec.p for x, y in zip(xs, ys)]
    assert orc.ff_inv(spec, xs) == [
        pow(x, spec.p - 2, spec.p) if x else 0 for x in xs
    ]


@pytest.mark.parametrize("curve", [PALLAS, GRUMPKIN], ids=lambda c: c.name)
def test_msm_agrees(orc, curve, rng):
    from halo2_liam_eagen_msm_tpu.utils import pyref

    n = 8
    pts = pyref.random_points(rng, curve, n)
    pts[3] = None
    sc = [rng.randrange(curve.scalar_field.p) for _ in range(n)]
    sc[0] = 0
    assert orc.ec_msm(curve, sc, pts) == pyref.ec_msm(sc, pts, curve)


def test_divisor_witness_agrees(orc, rng):
    """C++ witness coefficients == Python host oracle == (transitively, via
    test_divisor) the JAX path."""
    from halo2_liam_eagen_msm_tpu.utils import pyref, ref_divisor

    curve = PALLAS
    for n in (4, 7, 10):
        pts = pyref.random_points(rng, curve, n - 1)
        s = None
        for p in pts:
            s = pyref.ec_add(s, p, curve)
        pts = pts + [pyref.ec_neg(s, curve)]
        # sprinkle identities
        pts[1] = None
        ca, cb, cout = orc.divisor_witness(curve, pts)
        hrf, hout = ref_divisor.divisor_witness_host(curve, pts)
        assert cout == hout
        assert ca == hrf.a.coeffs, f"a coeffs n={n}"
        assert cb == hrf.b.coeffs, f"b coeffs n={n}"
