"""MXU radix-shuffle reorder kernels (ops/radix.py) in pallas interpret mode.

The shuffle replaces the per-window sorted-point gather of the Pippenger MSM
(ops/msm.py, the TPU answer to the data-dependent scatter inside the
reference's best_multiexp, /root/reference/src/argument_witness_calc.rs:144).
These tests run the rank/shuffle/pass-B/compact kernels end to end against a
slot-exact numpy model (tools/validate_radix.numpy_model) on small shapes;
bit-exactness at production shapes is re-checked on hardware by
tools/validate_radix.py and the MSM-level A/B by tools/ab_radix_msm.py.
"""

import numpy as np
import pytest

from halo2_liam_eagen_msm_tpu.ops import radix

from tools.validate_radix import numpy_model


@pytest.mark.fast
def test_plan_invariants():
    """Static shape invariants the kernels rely on; the R_pad/SHB interplay
    regressed once (ghost rounding after strip choice left pass-B rows
    unwritten at small shapes)."""
    for n, c, T in [
        (512, 8, None), (1024, 10, 512), (4096, 12, None),
        (1 << 13, 15, None), (1 << 17, 15, None), (1 << 20, 15, None),
        (1 << 20, 16, None), (1 << 18, 9, None),
    ]:
        p = radix.make_plan(n, c, T)
        assert p.cb + p.fb == c and p.P == 1 << p.cb
        assert p.OUT_ROWS % p.SH == 0, (n, c)
        assert p.R_pad % p.SHB == 0, (n, c)       # pass B writes every row
        assert p.R_pad % radix.GHOST == 0, (n, c)  # 1024-elem DMA slices
        assert p.R_pad >= p.R
        assert p.OUT_ROWS >= p.P * p.S + p.SP
        assert p.FB_COLS % 128 == 0 and p.FB_COLS >= (1 << p.fb) + 1
        assert p.n_ext == n + radix.GHOST * p.P


def _run_case(n, c, T, seed, ident_frac=0.02, skew=None):
    rng = np.random.default_rng(seed)
    plan = radix.make_plan(n, c, T)
    keys = rng.integers(0, 1 << c, size=n).astype(np.int32)
    if skew == "low":
        keys = (keys % 7).astype(np.int32)   # crowd few coarse partitions
    pay = rng.integers(1, 1 << 32, size=(n, 16), dtype=np.uint32)
    pay[rng.random(n) < ident_frac] = 0      # identity rows are dropped
    keys[rng.random(n) < ident_frac] = 0

    import jax.numpy as jnp
    got = radix.radix_window(plan, jnp.asarray(keys), jnp.asarray(pay))
    sorted_pay, hi, spill_pay, spill_keys = (np.asarray(g) for g in got[:4])
    overflow = bool(got[4])

    m_main, m_hi, m_spill, m_spill_keys, m_overflow = numpy_model(
        plan, keys, pay)
    assert overflow == m_overflow
    nvalid = m_main.shape[0]
    assert np.array_equal(sorted_pay[:nvalid], m_main)
    assert (sorted_pay[nvalid:] == 0).all()
    assert np.array_equal(hi, m_hi)
    assert np.array_equal(spill_pay, m_spill)
    assert np.array_equal(spill_keys, m_spill_keys)
    return overflow


@pytest.mark.medium
def test_radix_window_single_tile():
    _run_case(512, 8, None, 5)


@pytest.mark.medium
def test_radix_window_two_tiles():
    """Two tiles exercise the (tile, partition) -> partition-major transpose
    and the ordered compact DMA across tiles."""
    _run_case(1024, 10, 512, 9)


@pytest.mark.medium
def test_radix_window_skewed_overflow():
    """Crowding all keys into a few coarse partitions overflows the per-tile
    spill capacity; the flag must trip (callers then take the exact
    sort+gather fallback)."""
    ov = _run_case(1024, 10, 512, 13, skew="low")
    assert ov, "skewed keys must overflow the spill buffer"
