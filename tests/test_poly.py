"""Polynomial algebra tests — mirrors the reference's poly_test /
karatsuba_test (/root/reference/src/regular_functions_utils.rs:554-589) plus
device-vs-host oracle checks for every kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from halo2_liam_eagen_msm_tpu.fields import BN254_FR, PALLAS_FP
from halo2_liam_eagen_msm_tpu.limbs import (
    ints_to_mont_limbs,
    mont_limbs_to_ints,
)
from halo2_liam_eagen_msm_tpu.ops import poly as P
from halo2_liam_eagen_msm_tpu.ops.poly import Poly

SPEC = PALLAS_FP


def rand_poly(rng, n, spec=SPEC):
    return Poly(spec, [rng.randrange(spec.p) for _ in range(n)])


def dev(p: Poly, pad=None):
    return p.to_device(pad)


def back(arr, length=None, spec=SPEC):
    return Poly.from_device(spec, arr, length)


def test_host_poly_identities(rng):
    """The reference's poly_test: add/mul at a random point, kate division
    identity, no-leading-zero-pad property (:554-579)."""
    p = rand_poly(rng, 100)
    q = rand_poly(rng, 423)
    t = rng.randrange(SPEC.p)
    assert (p + q).ev(t) == (p.ev(t) + q.ev(t)) % SPEC.p
    assert (p * q).ev(t) == (p.ev(t) * q.ev(t)) % SPEC.p

    p2 = p + Poly(SPEC, [-p.ev(t)])
    qd = p.kate_div(t)
    t2 = rng.randrange(SPEC.p)
    assert p2.ev(t2) == qd.ev(t2) * (t2 - t) % SPEC.p

    r = Poly(SPEC, [0] * 5)
    assert len(r.kate_div(t)) == 4  # division drops exactly one coefficient


def test_host_karatsuba(rng):
    p = rand_poly(rng, 100)
    q = rand_poly(rng, 57)
    t = rng.randrange(SPEC.p)
    assert p.mul_karatsuba(q).ev(t) == p.ev(t) * q.ev(t) % SPEC.p


def test_device_eval(rng):
    p = rand_poly(rng, 200)
    xs = [rng.randrange(SPEC.p) for _ in range(4)]
    coeffs = dev(p)
    x = jnp.asarray(ints_to_mont_limbs(xs, SPEC))
    got = mont_limbs_to_ints(
        np.asarray(jax.jit(lambda c, x: P.eval_poly(SPEC, c, x))(coeffs[None], x)),
        SPEC,
    )
    assert got == [p.ev(v) for v in xs]


def test_device_kate_div(rng):
    p = rand_poly(rng, 77)
    b = rng.randrange(SPEC.p)
    coeffs = dev(p)
    bb = jnp.asarray(ints_to_mont_limbs([b], SPEC))[0]
    got = back(P.kate_div(SPEC, coeffs, bb), length=76)
    assert got.coeffs == p.kate_div(b).coeffs
    # b == 0 masked path: quotient is a shift
    zero = jnp.zeros_like(bb)
    got0 = back(P.kate_div(SPEC, coeffs, zero), length=76)
    assert got0.coeffs == p.kate_div(0).coeffs == p.coeffs[1:]


def test_device_mul_naive_and_fft(rng):
    for la, lb in [(1, 1), (3, 8), (31, 31), (7, 100), (40, 40), (33, 120)]:
        p = rand_poly(rng, la)
        q = rand_poly(rng, lb)
        want = (p * q).coeffs
        got_n = back(P.mul_naive(SPEC, dev(p), dev(q)), length=la + lb - 1)
        assert got_n.coeffs == want, f"naive {la}x{lb}"
        got_f = back(P.mul_fft(SPEC, dev(p), dev(q)), length=la + lb - 1)
        assert got_f.coeffs == want, f"fft {la}x{lb}"
        got_a = back(P.mul_auto(SPEC, dev(p), dev(q)), length=la + lb - 1)
        assert got_a.coeffs == want, f"auto {la}x{lb}"


def test_device_add_scale_shr(rng):
    p = rand_poly(rng, 10)
    q = rand_poly(rng, 25)
    sc = rng.randrange(SPEC.p)
    got = back(P.add_padded(SPEC, dev(p), dev(q)), length=25)
    assert got.coeffs == (p + q).coeffs
    scm = jnp.asarray(ints_to_mont_limbs([sc], SPEC))[0]
    got = back(P.scale(SPEC, dev(p), scm), length=10)
    assert got.coeffs == p.scale(sc).coeffs
    got = back(P.shr(SPEC, dev(p), 4), length=14)
    assert got.coeffs == (p >> 4).coeffs


def test_batched_vmap_mul(rng):
    """Batched polynomial products — the shape the divisor merge tree uses."""
    m, la, lb = 6, 9, 12
    ps = [rand_poly(rng, la) for _ in range(m)]
    qs = [rand_poly(rng, lb) for _ in range(m)]
    a = jnp.stack([dev(p) for p in ps])
    b = jnp.stack([dev(q) for q in qs])
    got = P.mul_naive(SPEC, a, b)
    for i in range(m):
        assert back(got[i], la + lb - 1).coeffs == (ps[i] * qs[i]).coeffs
