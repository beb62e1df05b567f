"""Witness-generation tests: the generated b-column satisfies every b-gate
identity under the checker, limb/integrity cells are lookup-able, and the
log-derivative columns close."""

import pytest

from halo2_liam_eagen_msm_tpu.circuit import checker, gates, witness
from halo2_liam_eagen_msm_tpu.fields import PALLAS
from halo2_liam_eagen_msm_tpu.negbase import table_entry_by_id


BASE, NUM_DIGITS, LOGTABLE = 5, 56, 4
NUM_LIMBS = (NUM_DIGITS + LOGTABLE - 1) // LOGTABLE


pytestmark = pytest.mark.fast

def test_b_gates_satisfied(rng):
    curve = PALLAS
    p = curve.field.p
    box = (NUM_LIMBS + 1) * BASE
    for _ in range(5):
        sc = rng.randrange(1 << 112)
        col = witness.scalar_box_column(curve, sc, BASE, NUM_DIGITS, LOGTABLE)
        assert len(col) == box
        g = checker.Grid(2 * box, p)
        g.set_col("b", col)
        g.set_col("s1sc", [1] + [0] * (2 * box - 1))
        g.set_col("s2sc", [
            1 if (0 < i < box and i % (NUM_LIMBS + 1) == 0) else 0
            for i in range(2 * box)
        ])
        g.set_col("s3sc", [1 if 0 < i < NUM_LIMBS + 1 else 0 for i in range(2 * box)])
        gate = lambda pp, view: gates.gate_b(pp, view, BASE, NUM_LIMBS, LOGTABLE)
        g.assert_satisfied({"b": gate}, rows=range(box))
        # the scalar row carries (-BASE)*sc by construction (module docstring)
        assert col[0] == (-BASE) * sc % p


def test_cells_are_table_entries(rng):
    curve = PALLAS
    sc = rng.randrange(1 << 112)
    col = witness.scalar_box_column(curve, sc, BASE, NUM_DIGITS, LOGTABLE)
    ids, union = witness.box_lookup_ids(sc, BASE, NUM_DIGITS, LOGTABLE)
    for d in range(BASE - 1):
        for j in range(NUM_LIMBS):
            cell = col[(NUM_LIMBS + 1) * (d + 1) + 1 + j]
            assert cell == table_entry_by_id(BASE, ids[d][j], curve.field)
    for j in range(NUM_LIMBS):
        assert col[1 + j] == table_entry_by_id(BASE, union[j], curve.field)


def test_lookup_columns_close(rng):
    curve = PALLAS
    table = [table_entry_by_id(BASE, i, curve.field) for i in range(1 << LOGTABLE)]
    sc = rng.randrange(1 << 112)
    col = witness.scalar_box_column(curve, sc, BASE, NUM_DIGITS, LOGTABLE)
    # looked-up cells: every limb and integrity row of the box (everything
    # except the scalar row and bucket rows, i.e. i % (NL+1) != 0)
    cells = [c for i, c in enumerate(col) if i % (NUM_LIMBS + 1) != 0]
    v = rng.randrange(curve.field.p)
    rhs, mults, lhs = witness.lookup_columns(curve, cells, table, v)
    assert rhs[-1] == lhs[-1]
    assert sum(mults) == len(cells)
