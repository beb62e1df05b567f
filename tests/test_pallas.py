"""Pallas kernel parity tests (interpret mode on CPU).

The Pallas kernels are the TPU production path; these tests run them in
interpreter mode against the jnp limb path at one-block sizes so CI covers
the kernel logic without hardware."""

import jax.numpy as jnp
import numpy as np
import pytest

from halo2_liam_eagen_msm_tpu import config
from halo2_liam_eagen_msm_tpu.fields import PALLAS, PALLAS_FP
from halo2_liam_eagen_msm_tpu.limbs import ints_to_mont_limbs, mont_limbs_to_ints
from halo2_liam_eagen_msm_tpu.ops import pallas_ff as PF
from halo2_liam_eagen_msm_tpu.ops.ec import JPoint, ec
from halo2_liam_eagen_msm_tpu.utils import pyref

B = 1024  # one block


def test_mont_mul_addsub_parity(rng):
    spec = PALLAS_FP
    xs = [rng.randrange(spec.p) for _ in range(B)]
    ys = [rng.randrange(spec.p) for _ in range(B)]
    xs[:2] = [0, spec.p - 1]
    ys[:2] = [spec.p - 1, spec.p - 1]
    a = jnp.asarray(ints_to_mont_limbs(xs, spec))
    b = jnp.asarray(ints_to_mont_limbs(ys, spec))
    got_mul = mont_limbs_to_ints(np.asarray(PF.mont_mul(spec, a, b)), spec)
    got_add = mont_limbs_to_ints(np.asarray(PF.mont_addsub(spec, False, a, b)), spec)
    got_sub = mont_limbs_to_ints(np.asarray(PF.mont_addsub(spec, True, a, b)), spec)
    for x, y, gm, ga, gs in zip(xs, ys, got_mul, got_add, got_sub):
        assert gm == x * y % spec.p
        assert ga == (x + y) % spec.p
        assert gs == (x - y) % spec.p


@pytest.mark.skipif(
    __import__("jax").default_backend() == "cpu",
    reason="EC kernel bodies are too large for interpret mode; validated on TPU "
    "(tools/tpu_validate.py) — mont_mul parity above covers the limb math in CI",
)
def test_ec_kernels_parity(rng):
    curve = PALLAS
    E = ec(curve)
    n = 64  # padded to one block inside the wrapper
    p1 = pyref.random_points(rng, curve, n)
    p2 = pyref.random_points(rng, curve, n)
    p1[0] = None
    p2[1] = None
    p1[2] = None; p2[2] = None
    p2[3] = p1[3]
    p2[4] = pyref.ec_neg(p1[4], curve)
    a = E.points_from_ints(p1)
    b = E.points_from_ints(p2)
    ox, oy, oz = PF.ec_add(curve, a.x, a.y, a.z, b.x, b.y, b.z)
    got = E.points_to_ints(JPoint(ox, oy, oz))
    want = [pyref.ec_add(x, y, curve) for x, y in zip(p1, p2)]
    assert got == want

    dx, dy, dz = PF.ec_double(curve, a.x, a.y, a.z)
    got = E.points_to_ints(JPoint(dx, dy, dz))
    want = [pyref.ec_add(x, x, curve) for x in p1]
    assert got == want


@pytest.mark.skipif(
    __import__("jax").default_backend() == "cpu",
    reason="routes through the EC kernels; see test_ec_kernels_parity",
)
def test_routed_dispatch(rng):
    """With the flag forced on, EC.add routes through the kernels and still
    matches the oracle (leading-dims flattening included)."""
    curve = PALLAS
    E = ec(curve)
    config.set_use_pallas(True)
    try:
        pts = pyref.random_points(rng, curve, 512)
        a = E.points_from_ints(pts[:256])
        b = E.points_from_ints(pts[256:])
        # reshape to (4, 64) leading dims to exercise flattening
        a2 = JPoint(a.x.reshape(4, 64, 16), a.y.reshape(4, 64, 16), a.z.reshape(4, 64, 16))
        b2 = JPoint(b.x.reshape(4, 64, 16), b.y.reshape(4, 64, 16), b.z.reshape(4, 64, 16))
        r = E.add(a2, b2)
        got = E.points_to_ints(JPoint(r.x.reshape(-1, 16), r.y.reshape(-1, 16), r.z.reshape(-1, 16)))
        want = [pyref.ec_add(x, y, curve) for x, y in zip(pts[:256], pts[256:])]
        assert got == want
    finally:
        config.set_use_pallas(None)
