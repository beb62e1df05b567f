"""MXU constant-multiply prototype: bit-exact vs the VPU/XLA field path.

The Toeplitz byte-matmul construction must agree with ff.FF.mul for every
input (exact integer arithmetic in bf16/f32 — see ops/mxu_ff.py docstring).
Reference Montgomery semantics: the `ff` crate core (SURVEY.md L0)."""

import numpy as np
import pytest

from halo2_liam_eagen_msm_tpu.fields import PALLAS, N_LIMBS
from halo2_liam_eagen_msm_tpu.limbs import ints_to_mont_limbs, mont_limbs_to_ints
from halo2_liam_eagen_msm_tpu.ops import mxu_ff
from halo2_liam_eagen_msm_tpu.ops.ff import ff

pytestmark = pytest.mark.fast


def _rand_elems(rng, spec, n):
    return [rng.randrange(spec.p) for _ in range(n)]


def test_mul_const_matches_vpu(rng):
    import jax.numpy as jnp

    spec = PALLAS.field
    k = ff(spec)
    vals = _rand_elems(rng, spec, 64) + [0, 1, spec.p - 1]
    a = jnp.asarray(ints_to_mont_limbs(vals, spec))
    for c_val in [rng.randrange(spec.p) for _ in range(3)] + [0, 1, spec.p - 1]:
        c_limbs = ints_to_mont_limbs([c_val], spec)[0]
        c_int = sum(int(v) << (16 * i) for i, v in enumerate(c_limbs))
        want = k.mul(a, jnp.broadcast_to(jnp.asarray(c_limbs), a.shape))
        got = mxu_ff.mul_const(spec, a, c_int)
        assert np.array_equal(np.asarray(got), np.asarray(want)), c_val


def test_mul_table_matches_vpu(rng):
    import jax.numpy as jnp

    spec = PALLAS.field
    k = ff(spec)
    n_pos, batch = 8, 5
    vals = _rand_elems(rng, spec, n_pos * batch)
    a = jnp.asarray(ints_to_mont_limbs(vals, spec)).reshape(batch, n_pos, N_LIMBS)
    tvals = _rand_elems(rng, spec, n_pos - 2) + [0, 1]
    table = np.asarray(ints_to_mont_limbs(tvals, spec))
    want = k.mul(a, jnp.broadcast_to(jnp.asarray(table), a.shape))
    got = mxu_ff.mul_table(spec, a, table)
    assert np.array_equal(np.asarray(got), np.asarray(want))
