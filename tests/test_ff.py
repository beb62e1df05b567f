"""Field arithmetic tests: JAX limb kernels vs exact Python ints.

Mirrors the reference's oracle-pyramid strategy (SURVEY.md §4): every op is
checked against an independent slower implementation (here: Python bignums)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from halo2_liam_eagen_msm_tpu.fields import BN254_FR, PALLAS_FP, VESTA_FP, N_LIMBS
from halo2_liam_eagen_msm_tpu.limbs import (
    ints_to_mont_limbs,
    mont_limbs_to_ints,
    ints_to_limbs,
    limbs_to_ints,
)
from halo2_liam_eagen_msm_tpu.ops.ff import ff

FIELDS = [PALLAS_FP, VESTA_FP, BN254_FR]


def rand_elems(rng, f, n):
    return [rng.randrange(f.p) for _ in range(n)]


@pytest.mark.parametrize("spec", FIELDS, ids=lambda s: s.name)
def test_add_sub_neg(spec, rng):
    k = ff(spec)
    n = 64
    xs, ys = rand_elems(rng, spec, n), rand_elems(rng, spec, n)
    a = jnp.asarray(ints_to_mont_limbs(xs, spec))
    b = jnp.asarray(ints_to_mont_limbs(ys, spec))
    got_add = mont_limbs_to_ints(np.asarray(k.add(a, b)), spec)
    got_sub = mont_limbs_to_ints(np.asarray(k.sub(a, b)), spec)
    got_neg = mont_limbs_to_ints(np.asarray(k.neg(a)), spec)
    for x, y, ga, gs, gn in zip(xs, ys, got_add, got_sub, got_neg):
        assert ga == (x + y) % spec.p
        assert gs == (x - y) % spec.p
        assert gn == (-x) % spec.p


@pytest.mark.parametrize("spec", FIELDS, ids=lambda s: s.name)
def test_mul(spec, rng):
    k = ff(spec)
    n = 64
    xs, ys = rand_elems(rng, spec, n), rand_elems(rng, spec, n)
    # include boundary values
    xs[:3] = [0, 1, spec.p - 1]
    ys[:3] = [spec.p - 1, spec.p - 1, spec.p - 1]
    a = jnp.asarray(ints_to_mont_limbs(xs, spec))
    b = jnp.asarray(ints_to_mont_limbs(ys, spec))
    got = mont_limbs_to_ints(np.asarray(jax.jit(k.mul)(a, b)), spec)
    for x, y, g in zip(xs, ys, got):
        assert g == (x * y) % spec.p


@pytest.mark.parametrize("spec", FIELDS, ids=lambda s: s.name)
def test_mont_roundtrip(spec, rng):
    k = ff(spec)
    xs = rand_elems(rng, spec, 16)
    raw = jnp.asarray(ints_to_limbs(xs))
    m = k.to_mont(raw)
    assert mont_limbs_to_ints(np.asarray(m), spec) == [x % spec.p for x in xs]
    back = k.from_mont(m)
    assert limbs_to_ints(np.asarray(back)) == xs


def test_inv(rng):
    spec = PALLAS_FP
    k = ff(spec)
    xs = rand_elems(rng, spec, 16)
    xs[0] = 1
    a = jnp.asarray(ints_to_mont_limbs(xs, spec))
    got = mont_limbs_to_ints(np.asarray(jax.jit(k.inv)(a)), spec)
    for x, g in zip(xs, got):
        assert g == pow(x, spec.p - 2, spec.p)
    # inv(0) == 0
    z = jnp.zeros((N_LIMBS,), dtype=jnp.uint32)
    assert mont_limbs_to_ints(np.asarray(k.inv(z))[None], spec) == [0]


def test_batch_inv(rng):
    spec = PALLAS_FP
    k = ff(spec)
    xs = rand_elems(rng, spec, 33)
    xs[5] = 0  # zero must map to zero
    a = jnp.asarray(ints_to_mont_limbs(xs, spec))
    got = mont_limbs_to_ints(np.asarray(jax.jit(k.batch_inv)(a)), spec)
    for x, g in zip(xs, got):
        assert g == (pow(x, spec.p - 2, spec.p) if x else 0)


def test_pow_fixed_and_mul_small(rng):
    spec = PALLAS_FP
    k = ff(spec)
    xs = rand_elems(rng, spec, 8)
    a = jnp.asarray(ints_to_mont_limbs(xs, spec))
    got = mont_limbs_to_ints(np.asarray(k.pow_fixed(a, 12345)), spec)
    for x, g in zip(xs, got):
        assert g == pow(x, 12345, spec.p)
    for sc in (0, 1, 2, 5, 17):
        got = mont_limbs_to_ints(np.asarray(k.mul_small(a, sc)), spec)
        for x, g in zip(xs, got):
            assert g == (x * sc) % spec.p
