"""Frozen Rust-semantics divisor vectors (VERDICT r3 item 8).

The reference's witness coefficients depend on halo2curves' internal
Jacobian Z values (linefunc consumes (x*z, y, z^3) projective coords,
/root/reference/src/regular_functions_utils.rs:284-303,426-431).
utils/rustsem.py replicates that Z-chain exactly (add-2007-bl /
dbl-2009-l value chains); data/golden_divisor_*.json freezes its output
on a fixed input set (tools/gen_golden_divisor.py).

Checks: recompute == frozen; the divisor property; and the documented
relation between conventions — the Rust-semantics witness equals the
framework's canonical affine-normalized witness times ONE nonzero field
constant (each line differs by a scalar, kate_div is linear).
"""

import json
import os

import pytest

from halo2_liam_eagen_msm_tpu.fields import GRUMPKIN, PALLAS
from halo2_liam_eagen_msm_tpu.utils import rustsem

pytestmark = pytest.mark.fast

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "halo2_liam_eagen_msm_tpu", "data")

CURVES = {"grumpkin": GRUMPKIN, "pallas": PALLAS}


def _load(name):
    with open(os.path.join(DATA, f"golden_divisor_{name}.json")) as f:
        rec = json.load(f)
    pts = [(int(x, 16), int(y, 16)) for x, y in rec["points"]]
    wa = [int(c, 16) for c in rec["wtns_a"]]
    wb = [int(c, 16) for c in rec["wtns_b"]]
    return pts, wa, wb


@pytest.mark.parametrize("name", ["grumpkin", "pallas"])
def test_golden_divisor_frozen(name):
    curve = CURVES[name]
    pts, wa, wb = _load(name)
    jac = [(x, y, 1) for (x, y) in pts]
    wtns, out = rustsem.compute_divisor_witness_partial(jac, curve)
    assert rustsem.jac_is_identity(out)
    assert wtns.a == wa and wtns.b == wb, \
        "Z-chain witness diverged from the frozen golden vector"


@pytest.mark.parametrize("name", ["grumpkin", "pallas"])
def test_golden_divisor_property(name):
    curve = CURVES[name]
    p = curve.field.p
    pts, wa, wb = _load(name)
    w = rustsem.RustRF(wa, wb)
    for (x, y) in pts:
        assert w.ev(x, y, p) == 0
    # ... and does NOT vanish at an unrelated point (nontrivial witness)
    from halo2_liam_eagen_msm_tpu.utils import pyref
    import random
    q = pyref.random_point(random.Random(1), curve)
    assert w.ev(q[0], q[1], p) != 0


@pytest.mark.parametrize("name", ["grumpkin", "pallas"])
def test_rustsem_vs_canonical_proportional(name):
    """Rust-semantics coefficients == canonical affine-normalized
    coefficients x one nonzero constant (the whole difference between the
    two conventions; divisor.py module docstring)."""
    curve = CURVES[name]
    p = curve.field.p
    pts, wa, wb = _load(name)
    jac = [(x, y, 1) for (x, y) in pts]
    canon, out = rustsem.compute_divisor_witness_partial(
        jac, curve, canonical=True)
    assert rustsem.jac_is_identity(out)
    assert len(canon.a) == len(wa) and len(canon.b) == len(wb)
    # constant from the first nonzero canonical a-coefficient
    i0 = next(i for i, c in enumerate(canon.a) if c != 0)
    k = wa[i0] * pow(canon.a[i0], p - 2, p) % p
    assert k != 0
    assert all(wa[i] == k * canon.a[i] % p for i in range(len(wa)))
    assert all(wb[i] == k * canon.b[i] % p for i in range(len(wb)))


def test_canonical_rustsem_matches_device_tree(rng):
    """The canonical-mode host replica must BIT-match the device merge tree
    (divisor.compute_divisor_witness_partial) — tying the golden-vector
    machinery to the production path with a tiny graph (n=4, naive mul)."""
    import numpy as np

    from halo2_liam_eagen_msm_tpu.divisor import (
        compute_divisor_witness_partial as dev_witness,
    )
    from halo2_liam_eagen_msm_tpu.limbs import mont_limbs_to_ints
    from halo2_liam_eagen_msm_tpu.ops.ec import ec
    from halo2_liam_eagen_msm_tpu.utils import pyref

    curve = PALLAS
    E = ec(curve)
    n = 4
    pts_ints = pyref.random_points(rng, curve, n - 1)
    pts_ints.append(
        pyref.ec_neg(pyref.ec_msm([1] * (n - 1), pts_ints, curve), curve))
    wtns, out = rustsem.compute_divisor_witness_partial(
        [(x, y, 1) for (x, y) in pts_ints], curve, canonical=True)
    assert rustsem.jac_is_identity(out)

    pts = E.points_from_ints(pts_ints)
    dw, dout = dev_witness(curve, pts)
    spec = curve.field
    da = mont_limbs_to_ints(np.asarray(dw.a), spec)
    db = mont_limbs_to_ints(np.asarray(dw.b), spec)
    # device arrays are padded to the level's semantic length; the host
    # lists drop trailing zeros the same way the reference's Polynomial does
    assert da[:len(wtns.a)] == wtns.a and all(c == 0 for c in da[len(wtns.a):])
    assert db[:len(wtns.b)] == wtns.b and all(c == 0 for c in db[len(wtns.b):])
