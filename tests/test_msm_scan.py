"""Direct tests of the wide blocked prefix scan used by the Pallas MSM path
(runs its logic on the CPU jnp backend — the combine is backend-agnostic)."""

import jax.numpy as jnp
import numpy as np
import pytest

from halo2_liam_eagen_msm_tpu.fields import PALLAS
from halo2_liam_eagen_msm_tpu.ops.ec import ec
from halo2_liam_eagen_msm_tpu.ops.msm import _blocked_prefix_wide
from halo2_liam_eagen_msm_tpu.utils import pyref


@pytest.mark.parametrize("n", [3, 64, 70])
def test_blocked_prefix_wide(rng, n):
    curve = PALLAS
    E = ec(curve)
    pts = pyref.random_points(rng, curve, n)
    pts[min(1, n - 1)] = None  # identity in the stream
    batch = E.points_from_ints(pts)
    got = E.points_to_ints(_blocked_prefix_wide(E, batch))
    acc = None
    want = []
    for p in pts:
        acc = pyref.ec_add(acc, p, curve)
        want.append(acc)
    assert got == want
