"""Negbase decomposition tests (reference negbase_utils.rs semantics)."""

import numpy as np
import pytest

from halo2_liam_eagen_msm_tpu import negbase
from halo2_liam_eagen_msm_tpu.fields import BN254_FR, PALLAS_FP
from halo2_liam_eagen_msm_tpu.limbs import ints_to_limbs


pytestmark = pytest.mark.fast

def test_roundtrip_base17(rng):
    """Mirror of the reference's negbase_test (decompose random u32 in base 17,
    fold back with acc*(-17)+digit, negbase_utils.rs:126-134)."""
    for _ in range(50):
        x = rng.randrange(1 << 32)
        digits = negbase.negbase_decompose(x, 17)
        assert all(0 <= d < 17 for d in digits)
        assert negbase.negbase_recompose(digits, 17) == x


def test_roundtrip_various_bases(rng):
    for base in (2, 3, 5, 7, 13, 255):
        for _ in range(10):
            x = rng.randrange(1 << 130)
            digits = negbase.negbase_decompose(x, base)
            assert negbase.negbase_recompose(digits, base) == x
    assert negbase.negbase_decompose(0, 5) == []


def test_frozen_vectors():
    """Frozen digit streams (deterministic harness replacing the reference's
    unseeded OsRng; regenerated from the exact recurrence)."""
    assert negbase.negbase_decompose(1, 3) == [1]
    assert negbase.negbase_decompose(2, 3) == [2]
    assert negbase.negbase_decompose(3, 3) == [0, 2, 1]
    assert negbase.negbase_decompose(100, 5) == [0, 0, 4]
    assert negbase.negbase_decompose(12345678901234567890, 5) == [
        0, 2, 1, 2, 4, 4, 3, 3, 1, 3, 2, 3, 0, 4, 2, 4, 2, 2, 1, 1, 4, 0, 3, 0, 2, 4, 4, 4, 1,
    ]


def test_batch_matches_scalar(rng):
    base = 5
    num_digits = 57
    xs = [rng.randrange(1 << 128) for _ in range(200)] + [0, 1, 4, 5, 24, 25]
    mags = ints_to_limbs(xs)
    got = negbase.negbase_decompose_batch(mags, base, num_digits)
    for x, row in zip(xs, got):
        want = negbase.negbase_decompose(x, base)
        want = want + [0] * (num_digits - len(want))
        assert list(row) == want, f"x={x}"


def test_digit_ids():
    assert negbase.id_by_digit(0) is None
    assert negbase.id_by_digit(1) == 0
    assert negbase.id_by_digit(7) == 6
    assert negbase.digit_by_id(0) == 1
    assert negbase.digit_by_id(6) == 7


def test_table_entry_by_id():
    f = BN254_FR
    base = 5
    assert negbase.table_entry_by_id(base, 0, f) == 0
    # id=1: bits=[1] -> acc = (0+1)*(-5) = -5
    assert negbase.table_entry_by_id(base, 1, f) == (-5) % f.p
    # id=2: bits msb-first [1,0] -> ((1)*(-5) + 0)*(-5) = 25
    assert negbase.table_entry_by_id(base, 2, f) == 25 % f.p
    # id=3: [1,1] -> ((1)*(-5)+1)*(-5) = 20
    assert negbase.table_entry_by_id(base, 3, f) == 20 % f.p
    # id=5: [1,0,1] -> (((-5))*(-5)+1)*(-5) = -130
    assert negbase.table_entry_by_id(base, 5, f) == (-130) % f.p


def test_prepare_scalar_witness_structure():
    # logtable must be <= num_limbs or the (replicated) i%logtable+1 indexing
    # quirk would overrun the grid, as it would in the reference
    base, num_digits, logtable = 5, 56, 4
    sc = 123456789
    grid = negbase.prepare_scalar_witness(sc, base, num_digits, logtable)
    num_limbs = (num_digits + logtable - 1) // logtable
    assert len(grid) == base
    assert all(len(row) == num_limbs + 1 for row in grid)
    assert grid[0][0].kind == "scalar" and grid[0][0].value == sc
    # bucket identity: sum_d digit_by_id(d-1)... the scalar must equal
    # sum over digit-values d of d * bucket[d]
    total = 0
    for i in range(1, base):
        assert grid[i][0].kind == "bucket"
        total += i * grid[i][0].value
    assert total == sc
    # integrity rows: row 0 integrity = sum of per-digit integrities
    for j in range(1, num_limbs + 1):
        assert grid[0][j].integrity == sum(grid[i][j].integrity for i in range(1, base))
