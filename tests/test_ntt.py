"""NTT + FFT-precompute constant tests.

The reference's precomputed_fft_data.rs holds frozen Montgomery byte tables
for bn254_fr — the only bit-exact stored vectors in the whole crate
(SURVEY.md §4).  test_reference_frozen_tables parses them and checks our
generated constants byte-for-byte."""

import json
import os
import re

import jax.numpy as jnp
import numpy as np
import pytest

from halo2_liam_eagen_msm_tpu.fields import BN254_FR, PALLAS_FP, R
from halo2_liam_eagen_msm_tpu.limbs import ints_to_mont_limbs, mont_limbs_to_ints
from halo2_liam_eagen_msm_tpu.ops.ntt import ntt

REF_FFT_DATA = "/root/reference/src/precomputed_fft_data.rs"


def _parse_ref_tables():
    """Extract the three 64-entry byte tables from the reference source."""
    with open(REF_FFT_DATA) as f:
        src = f.read()
    fns = {}
    for name in ("omega_pow", "omega_pow_inv", "half_pow"):
        m = re.search(rf"fn {name}\([^)]*\) -> F \{{(.*?)\n    \}}", src, re.S)
        assert m, name
        body = m.group(1)
        entries = {}
        for em in re.finditer(r"(\d+)=>\[([0-9, ]+)\]", body):
            idx = int(em.group(1))
            entries[idx] = [int(b) for b in em.group(2).split(",")]
        fns[name] = entries
    return fns


@pytest.mark.skipif(not os.path.exists(REF_FFT_DATA), reason="reference absent")
def test_reference_frozen_tables():
    """Our computed omega/half tables match the reference's frozen Montgomery
    bytes for bn254_fr, byte-for-byte (R = 2^256 in both layouts)."""
    ref = _parse_ref_tables()
    spec = BN254_FR
    p = spec.p
    for i in range(64):
        for name, ours in (
            ("omega_pow", spec.omega_pow(i)),
            ("omega_pow_inv", spec.omega_pow_inv(i)),
            ("half_pow", spec.half_pow(i)),
        ):
            want = ref[name][i]
            mont = (ours * R) % p
            got = [(mont >> (8 * k)) & 0xFF for k in range(32)]
            assert got == want, f"{name}[{i}]"


def test_generated_data_files():
    """tools/gen_constants.py output matches the in-process computation."""
    import subprocess, sys, tempfile

    with tempfile.TemporaryDirectory() as d:
        subprocess.run(
            [sys.executable, os.path.join("tools", "gen_constants.py"), d],
            check=True,
            cwd="/root/repo",
        )
        with open(os.path.join(d, "bn254_fr_fft_precomp.json")) as f:
            data = json.load(f)
    assert int(data["root_of_unity"], 16) == BN254_FR.root_of_unity
    assert int(data["omega_pow"][3], 16) == BN254_FR.omega_pow(3)


@pytest.mark.parametrize("logn", [0, 1, 3, 6])
def test_ntt_roundtrip_and_dft(rng, logn):
    spec = PALLAS_FP
    n = 1 << logn
    xs = [rng.randrange(spec.p) for _ in range(n)]
    a = jnp.asarray(ints_to_mont_limbs(xs, spec))
    fa = ntt(spec, a)
    # direct DFT oracle
    w = spec.omega_pow(spec.s - logn) if logn else 1
    got = mont_limbs_to_ints(np.asarray(fa), spec)
    for k in range(n):
        want = sum(x * pow(w, j * k, spec.p) for j, x in enumerate(xs)) % spec.p
        assert got[k] == want, f"k={k}"
    # inverse round-trips
    back = ntt(spec, fa, inverse=True, scale=True)
    assert mont_limbs_to_ints(np.asarray(back), spec) == xs


def test_ntt_batched(rng):
    spec = BN254_FR
    n, batch = 8, 5
    xs = [[rng.randrange(spec.p) for _ in range(n)] for _ in range(batch)]
    a = jnp.stack([jnp.asarray(ints_to_mont_limbs(row, spec)) for row in xs])
    fa = ntt(spec, a)
    back = ntt(spec, fa, inverse=True, scale=True)
    got = [
        mont_limbs_to_ints(np.asarray(back[i]), spec) for i in range(batch)
    ]
    assert got == xs


@pytest.mark.parametrize("logn", [0, 1, 2, 4, 6])
def test_ntt_dif_dit_pair(rng, logn):
    """Gather-free pair: ntt_dif output is the bit-reversed ntt spectrum and
    intt_dit inverts it back to natural coefficients exactly."""
    from halo2_liam_eagen_msm_tpu.ops.ntt import _bitrev_perm, intt_dit, ntt_dif

    spec = PALLAS_FP
    n = 1 << logn
    xs = [rng.randrange(spec.p) for _ in range(n)]
    a = jnp.asarray(ints_to_mont_limbs(xs, spec))
    dif = np.asarray(ntt_dif(spec, a))
    full = np.asarray(ntt(spec, a))
    perm = _bitrev_perm(logn)
    assert (dif[perm] == full).all()
    back = intt_dit(spec, jnp.asarray(dif))
    assert mont_limbs_to_ints(np.asarray(back), spec) == xs
