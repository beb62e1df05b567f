#!/usr/bin/env python
"""On-device validation of the Pallas TPU kernels against the exact host
oracle (utils/pyref.py).

The EC kernel bodies are too large for Pallas interpret mode on CPU, so CPU
CI covers only the limb math (tests/test_pallas.py); this script runs the
full kernel set on real hardware.  Run on the TPU host:

    python tools/tpu_validate.py

Exits nonzero on any mismatch.  Covers: mont mul/add/sub, ec_add, ec_double,
ec_add_mixed (incl. identity / equal / inverse / doubling edge lanes), the
blocked prefix-scan decomposition, and a small end-to-end MSM.
"""

import random
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as _ge
_c = _ge._host_cache_dir(); __import__("os").makedirs(_c, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _c)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from halo2_liam_eagen_msm_tpu.fields import PALLAS, PALLAS_FP
from halo2_liam_eagen_msm_tpu.limbs import ints_to_mont_limbs, mont_limbs_to_ints
from halo2_liam_eagen_msm_tpu.ops import pallas_ff as PF
from halo2_liam_eagen_msm_tpu.ops.ec import JPoint, ec
from halo2_liam_eagen_msm_tpu.ops.msm import msm_ints
from halo2_liam_eagen_msm_tpu.utils import pyref

FAILED = []


def check(name, ok):
    print(("PASS" if ok else "FAIL"), name, flush=True)
    if not ok:
        FAILED.append(name)


def main():
    rng = random.Random(0x7E57)
    print("device:", jax.devices()[0], flush=True)

    # ---- field kernels ----
    spec = PALLAS_FP
    n = 1024
    xs = [rng.randrange(spec.p) for _ in range(n)]
    ys = [rng.randrange(spec.p) for _ in range(n)]
    xs[:2] = [0, spec.p - 1]
    ys[:2] = [spec.p - 1, spec.p - 1]
    a = jnp.asarray(ints_to_mont_limbs(xs, spec))
    b = jnp.asarray(ints_to_mont_limbs(ys, spec))
    gm = mont_limbs_to_ints(np.asarray(PF.mont_mul(spec, a, b)), spec)
    ga = mont_limbs_to_ints(np.asarray(PF.mont_addsub(spec, False, a, b)), spec)
    gs = mont_limbs_to_ints(np.asarray(PF.mont_addsub(spec, True, a, b)), spec)
    check("mont_mul", all(g == x * y % spec.p for g, x, y in zip(gm, xs, ys)))
    check("mont_add", all(g == (x + y) % spec.p for g, x, y in zip(ga, xs, ys)))
    check("mont_sub", all(g == (x - y) % spec.p for g, x, y in zip(gs, xs, ys)))

    # ---- EC kernels (edge lanes: identities, equal, inverse) ----
    curve = PALLAS
    E = ec(curve)
    m = 64
    p1 = pyref.random_points(rng, curve, m)
    p2 = pyref.random_points(rng, curve, m)
    p1[0] = None
    p2[1] = None
    p1[2] = None; p2[2] = None
    p2[3] = p1[3]                              # doubling case
    p2[4] = pyref.ec_neg(p1[4], curve)         # inverse case
    A = E.points_from_ints(p1)
    B = E.points_from_ints(p2)

    ox, oy, oz = PF.ec_add(curve, A.x, A.y, A.z, B.x, B.y, B.z)
    got = E.points_to_ints(JPoint(ox, oy, oz))
    want = [pyref.ec_add(x, y, curve) for x, y in zip(p1, p2)]
    check("ec_add", got == want)

    dx, dy, dz = PF.ec_double(curve, A.x, A.y, A.z)
    got = E.points_to_ints(JPoint(dx, dy, dz))
    check("ec_double", got == [pyref.ec_add(x, x, curve) for x in p1])

    # mixed add: affine second operand (identity mask lanes included)
    qx, qy, qid = E.to_affine(B)
    qm = jnp.broadcast_to(qid.astype(jnp.uint32)[..., None], qx.shape)
    mx, my, mz = PF.ec_add_mixed(curve, A.x, A.y, A.z, qx, qy, qm)
    got = E.points_to_ints(JPoint(mx, my, mz))
    check("ec_add_mixed", got == want)

    # routed EC.add_mixed (mask-based API)
    r = E.add_mixed(A, qx, qy, qid)
    check("EC.add_mixed routed", E.points_to_ints(r) == want)

    # ---- prefix-scan decomposition on device ----
    from halo2_liam_eagen_msm_tpu.ops.msm import prefix_scan_parts_affine

    pts = pyref.random_points(rng, curve, 200)
    pts[1] = None
    pts[199] = pts[0]
    batch = E.points_from_ints(pts)
    ax_, ay_, aid_ = E.to_affine(batch)
    inner, offsets, w = prefix_scan_parts_affine(E, ax_, ay_, aid_)
    idx = jnp.arange(200)
    full = E.add(
        JPoint(offsets.x[idx // w], offsets.y[idx // w], offsets.z[idx // w]),
        JPoint(inner.x[idx], inner.y[idx], inner.z[idx]),
    )
    acc, run = None, []
    for p in pts:
        acc = pyref.ec_add(acc, p, curve)
        run.append(acc)
    check("prefix_scan_parts_affine", E.points_to_ints(full) == run)

    # ---- small end-to-end MSM ----
    n = 256
    pts = pyref.random_points(rng, curve, n)
    pts[10] = pts[11] = pts[12]
    scalars = [rng.randrange(1 << 64) for _ in range(n)]
    got = msm_ints(curve, scalars, pts, c=8, max_scalar_bits=64)
    check("msm 256 pts", got == pyref.ec_msm(scalars, pts, curve))

    if FAILED:
        print("FAILED:", FAILED)
        sys.exit(1)
    print("all TPU kernel validations passed")


if __name__ == "__main__":
    main()
