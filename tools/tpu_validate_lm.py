#!/usr/bin/env python
"""Real-TPU validation of the limb-major pallas NTT + merge tail.

Interpret mode on 2 vCPUs cannot afford the bigger stage graphs (the CPU
tier covers the lane-XOR path only; tests/test_pallas_ntt.py), so the
sublane-XOR, block-stride and full-tail paths are verified here against
the element-major implementations, bit-for-bit, on the actual chip:

  1. ntt_dif_lm / intt_dit_lm == ntt_dif / intt_dit at sizes with sublane
     and multi-block strides;
  2. compute_divisor_witness_partial with the lm merge tail == with the
     element-major tail at a point count whose top levels use block-stride
     stages (2048 points -> NTT sizes up to 8192).

Usage: python tools/tpu_validate_lm.py [--points 2048]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=2048)
    args = ap.parse_args()

    import random

    import jax

    import __graft_entry__ as _ge
    _c = _ge._host_cache_dir(); os.makedirs(_c, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _c)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from halo2_liam_eagen_msm_tpu import config as cfg
    from halo2_liam_eagen_msm_tpu import divisor as D
    from halo2_liam_eagen_msm_tpu.fields import PALLAS, N_LIMBS
    from halo2_liam_eagen_msm_tpu.limbs import ints_to_mont_limbs
    from halo2_liam_eagen_msm_tpu.ops import pallas_ntt as PN
    from halo2_liam_eagen_msm_tpu.ops.ec import ec
    from halo2_liam_eagen_msm_tpu.ops.ntt import intt_dit, ntt_dif
    from halo2_liam_eagen_msm_tpu.utils import pyref

    spec = PALLAS.field
    rng = np.random.default_rng(7)

    def rand_elems(shape):
        flat = int(np.prod(shape[:-1]))
        vals = [int.from_bytes(rng.bytes(40), "little") % spec.p
                for _ in range(flat)]
        return np.asarray(ints_to_mont_limbs(vals, spec)).reshape(shape)

    for batch, logn in [(8, 8), (4, 12), (1, 15)]:
        n = 1 << logn
        a = rand_elems((batch, n, N_LIMBS))
        want = np.asarray(ntt_dif(spec, jnp.asarray(a)))
        x_lm = PN.to_lm(jnp.asarray(a))
        got = np.asarray(
            PN.from_lm(PN.ntt_dif_lm(spec, x_lm, logn), (batch, n)))
        assert np.array_equal(got, want), f"fwd mismatch {batch}x2^{logn}"
        want_i = np.asarray(intt_dit(spec, jnp.asarray(a), scale=False))
        got_i = np.asarray(
            PN.from_lm(PN.intt_dit_lm(spec, x_lm, logn), (batch, n)))
        assert np.array_equal(got_i, want_i), f"inv mismatch {batch}x2^{logn}"
        print(f"transform parity OK: batch {batch} x 2^{logn}", flush=True)

    # full witness: lm tail vs element tail, bit-for-bit
    hostrng = random.Random(11)
    npts = args.points
    pts_ints = pyref.random_points(hostrng, PALLAS, npts - 1)
    pts_ints.append(
        pyref.ec_neg(pyref.ec_msm([1] * (npts - 1), pts_ints, PALLAS),
                     PALLAS))
    E = ec(PALLAS)
    pts = E.points_from_ints(pts_ints)
    cfg.set_lm_merge(False)
    w0, _ = D.compute_divisor_witness_partial(PALLAS, pts)
    a0, b0 = np.asarray(w0.a), np.asarray(w0.b)
    cfg.set_lm_merge(True)
    w1, o1 = D.compute_divisor_witness_partial(PALLAS, pts)
    assert bool(np.asarray(E.is_identity(o1)).all())
    assert np.array_equal(a0, np.asarray(w1.a)), "witness a mismatch"
    assert np.array_equal(b0, np.asarray(w1.b)), "witness b mismatch"
    print(f"witness parity OK: {npts} points (lm tail == element tail)",
          flush=True)


if __name__ == "__main__":
    main()
