#!/usr/bin/env python
"""Generate frozen Rust-semantics divisor golden vectors (VERDICT r3 item 8).

For a fixed seed, builds N-1 random affine points plus a closing point so
the multiset sums to the identity (the reference's randpoints_witness_test
shape, /root/reference/src/regular_functions_utils.rs:652-662), then runs
utils/rustsem.compute_divisor_witness_partial — the exact-int replica of
the reference's witness path INCLUDING halo2curves' Jacobian Z chains —
and freezes the resulting coefficients to data/golden_divisor_<curve>.json.

tests/test_rustsem.py consumes the files: recompute-equality, the divisor
property (vanishing at every input), and proportionality to the
framework's canonical affine-normalized witness.

Usage: python tools/gen_golden_divisor.py
"""

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from halo2_liam_eagen_msm_tpu.fields import GRUMPKIN, PALLAS
from halo2_liam_eagen_msm_tpu.utils import pyref, rustsem


def gen(curve, name, n=12, seed=0x60CD):
    rng = random.Random(seed)
    pts = pyref.random_points(rng, curve, n - 1)
    closing = pyref.ec_neg(pyref.ec_msm([1] * (n - 1), pts, curve), curve)
    pts.append(closing)
    jac = [(x, y, 1) for (x, y) in pts]
    wtns, out = rustsem.compute_divisor_witness_partial(jac, curve)
    assert rustsem.jac_is_identity(out), "points must sum to the identity"
    p = curve.field.p
    for (x, y) in pts:
        assert wtns.ev(x, y, p) == 0, "witness must vanish on every input"
    rec = {
        "curve": name,
        "seed": seed,
        "n": n,
        "points": [[hex(x), hex(y)] for (x, y) in pts],
        "wtns_a": [hex(c) for c in wtns.a],
        "wtns_b": [hex(c) for c in wtns.b],
        "semantics": "reference Z-chain (utils/rustsem.py; add-2007-bl / "
                     "dbl-2009-l value chains, projective_coords = "
                     "(x*z, y, z^3))",
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "halo2_liam_eagen_msm_tpu", "data", f"golden_divisor_{name}.json")
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {out_path}: n={n}, |a|={len(wtns.a)}, |b|={len(wtns.b)}")


def main():
    gen(GRUMPKIN, "grumpkin")  # the reference's concrete instantiation
    gen(PALLAS, "pallas")      # this framework's primary target


if __name__ == "__main__":
    main()
