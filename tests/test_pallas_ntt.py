"""Limb-major pallas NTT parity (interpret mode on CPU).

ntt_dif_lm / intt_dit_lm must be BIT-IDENTICAL to ops/ntt.ntt_dif /
intt_dit (same butterfly network, new layout/kernels).  Interpret-mode cost
scales with the unrolled stage count, so the CPU fast tier covers the
lane-XOR in-block path at tiny sizes; the sublane-XOR and block-stride
paths are `slow`-marked here and verified on real TPU by
tools/tpu_validate_lm.py (bit-compare against the element-major transforms
and the whole witness pipeline)."""

import numpy as np
import pytest

from halo2_liam_eagen_msm_tpu.fields import PALLAS, N_LIMBS


def _rand(shape):
    """Valid field elements (< p): unreduced inputs would legally reduce
    differently through the two butterfly formulations (the lm path's
    multiply-by-one fully reduces; a bare add may leave values in [p, 2p))."""
    from halo2_liam_eagen_msm_tpu.limbs import ints_to_mont_limbs

    p = PALLAS.field.p
    rng = np.random.default_rng(7)
    flat = int(np.prod(shape[:-1]))
    vals = [int.from_bytes(rng.bytes(40), "little") % p for _ in range(flat)]
    return np.asarray(ints_to_mont_limbs(vals, PALLAS.field)).reshape(shape)


@pytest.mark.medium
@pytest.mark.parametrize("batch,logn", [(512, 1), (256, 2)])
def test_fwd_inv_tiny(batch, logn):
    import jax.numpy as jnp

    from halo2_liam_eagen_msm_tpu.ops import pallas_ntt as PN
    from halo2_liam_eagen_msm_tpu.ops.ntt import intt_dit, ntt_dif

    spec = PALLAS.field
    n = 1 << logn
    a = _rand((batch, n, N_LIMBS))
    want = np.asarray(ntt_dif(spec, jnp.asarray(a)))
    x_lm = PN.to_lm(jnp.asarray(a))
    got = np.asarray(PN.from_lm(PN.ntt_dif_lm(spec, x_lm, logn), (batch, n)))
    assert np.array_equal(got, want)

    want_i = np.asarray(intt_dit(spec, jnp.asarray(a), scale=False))
    got_i = np.asarray(
        PN.from_lm(PN.intt_dit_lm(spec, x_lm, logn), (batch, n)))
    assert np.array_equal(got_i, want_i)


@pytest.mark.medium
def test_lm_elementwise_ops():
    import jax.numpy as jnp

    from halo2_liam_eagen_msm_tpu.ops import pallas_ntt as PN
    from halo2_liam_eagen_msm_tpu.ops.ff import ff

    spec = PALLAS.field
    k = ff(spec)
    a = _rand((2, 512, N_LIMBS))
    b = _rand((2, 512, N_LIMBS))
    al, bl = PN.to_lm(jnp.asarray(a)), PN.to_lm(jnp.asarray(b))
    got = np.asarray(PN.from_lm(PN.lm_mul(spec, al, bl), (2, 512)))
    want = np.asarray(k.mul(jnp.asarray(a), jnp.asarray(b)))
    assert np.array_equal(got, want)
    got = np.asarray(PN.from_lm(PN.lm_sub(spec, al, bl), (2, 512)))
    want = np.asarray(k.sub(jnp.asarray(a), jnp.asarray(b)))
    assert np.array_equal(got, want)
    n_mont = (512 << 256) % spec.p
    got = np.asarray(PN.from_lm(PN.lm_mul_const(spec, al, n_mont), (2, 512)))
    cb = jnp.broadcast_to(
        jnp.asarray(np.asarray(
            __import__("halo2_liam_eagen_msm_tpu.limbs",
                       fromlist=["int_to_limbs"]).int_to_limbs(n_mont),
            np.uint32)), (2, 512, N_LIMBS))
    want = np.asarray(k.mul(jnp.asarray(a), cb))
    assert np.array_equal(got, want)


@pytest.mark.slow
@pytest.mark.parametrize("batch,logn", [(8, 8), (1, 11)])
def test_fwd_sublane_and_block_stages(batch, logn):
    """Sublane-XOR (s in 128..512) and block-stride (s >= 1024) stages —
    interpret-mode heavy; the TPU script covers these fast."""
    import jax.numpy as jnp

    from halo2_liam_eagen_msm_tpu.ops import pallas_ntt as PN
    from halo2_liam_eagen_msm_tpu.ops.ntt import ntt_dif

    spec = PALLAS.field
    n = 1 << logn
    a = _rand((batch, n, N_LIMBS))
    want = np.asarray(ntt_dif(spec, jnp.asarray(a)))
    x_lm = PN.to_lm(jnp.asarray(a))
    got = np.asarray(PN.from_lm(PN.ntt_dif_lm(spec, x_lm, logn), (batch, n)))
    assert np.array_equal(got, want)
