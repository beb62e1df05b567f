#!/usr/bin/env python
"""Generate the FFT-precompute constant tables (TPU-native analog of the
reference's codegen test /root/reference/src/scripts.rs:36-74, which writes
src/precomputed_fft_data.rs).

Emits, per field: omega_pow[i] = ROOT_OF_UNITY^(2^i), omega_pow_inv[i],
half_pow[i] = (1/2)^i, for i in 0..64, as JSON with both canonical hex ints
and raw little-endian Montgomery bytes (R = 2^256, identical to halo2curves'
4x64 Montgomery layout, so the bn254_fr table is byte-comparable with the
reference's frozen precomputed_fft_data.rs — see tests/test_ntt.py).

Usage: python tools/gen_constants.py [outdir]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from halo2_liam_eagen_msm_tpu.fields import FIELDS, R


def mont_bytes(x: int, p: int) -> list[int]:
    m = (x * R) % p
    return [(m >> (8 * i)) & 0xFF for i in range(32)]


def gen_field_tables(spec) -> dict:
    p = spec.p
    return {
        "field": spec.name,
        "modulus": hex(p),
        "two_adicity": spec.s,
        "root_of_unity": hex(spec.root_of_unity),
        "omega_pow": [hex(spec.omega_pow(i)) for i in range(64)],
        "omega_pow_inv": [hex(spec.omega_pow_inv(i)) for i in range(64)],
        "half_pow": [hex(spec.half_pow(i)) for i in range(64)],
        "omega_pow_mont_bytes": [mont_bytes(spec.omega_pow(i), p) for i in range(64)],
        "omega_pow_inv_mont_bytes": [
            mont_bytes(spec.omega_pow_inv(i), p) for i in range(64)
        ],
        "half_pow_mont_bytes": [mont_bytes(spec.half_pow(i), p) for i in range(64)],
    }


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "halo2_liam_eagen_msm_tpu", "data"
    )
    os.makedirs(outdir, exist_ok=True)
    for name, spec in FIELDS.items():
        path = os.path.join(outdir, f"{name}_fft_precomp.json")
        with open(path, "w") as f:
            json.dump(gen_field_tables(spec), f)
        print("wrote", path)


if __name__ == "__main__":
    main()
