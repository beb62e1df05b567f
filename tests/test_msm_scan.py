"""Direct tests of the blocked prefix-scan decomposition used by the MSM
path (runs on the CPU jnp backend — the combine is backend-agnostic)."""

import jax.numpy as jnp
import numpy as np
import pytest

from halo2_liam_eagen_msm_tpu.fields import PALLAS
from halo2_liam_eagen_msm_tpu.ops.ec import JPoint, ec
from halo2_liam_eagen_msm_tpu.ops.msm import (
    prefix_scan_parts,
    prefix_scan_parts_affine,
    prefix_scan_points,
)
from halo2_liam_eagen_msm_tpu.utils import pyref


def _running_sums(pts, curve):
    acc = None
    out = []
    for p in pts:
        acc = pyref.ec_add(acc, p, curve)
        out.append(acc)
    return out


@pytest.mark.parametrize("n", [3, 64, 70])
def test_prefix_scan_points(rng, n):
    curve = PALLAS
    E = ec(curve)
    pts = pyref.random_points(rng, curve, n)
    pts[min(1, n - 1)] = None  # identity in the stream
    batch = E.points_from_ints(pts)
    got = E.points_to_ints(prefix_scan_points(E, batch))
    assert got == _running_sums(pts, curve)


@pytest.mark.parametrize("n", [5, 70])
def test_prefix_scan_parts_decomposition(rng, n):
    """inclusive_prefix[i] == offsets[i // w] + inner[i] at every i."""
    curve = PALLAS
    E = ec(curve)
    pts = pyref.random_points(rng, curve, n)
    pts[0] = None
    batch = E.points_from_ints(pts)
    inner, offsets, w = prefix_scan_parts(E, batch)
    idx = jnp.arange(n)
    full = E.add(
        JPoint(
            offsets.x[idx // w], offsets.y[idx // w], offsets.z[idx // w]
        ),
        JPoint(inner.x[idx], inner.y[idx], inner.z[idx]),
    )
    assert E.points_to_ints(full) == _running_sums(pts, curve)


@pytest.mark.parametrize("n", [6, 70])
def test_prefix_scan_parts_affine(rng, n):
    """The mixed-add (affine input) scan agrees with the Jacobian scan,
    including identity slots and a repeated point (doubling case)."""
    curve = PALLAS
    E = ec(curve)
    pts = pyref.random_points(rng, curve, n)
    pts[1] = None
    pts[n - 1] = pts[0]  # forces carry == element (double) at some step
    batch = E.points_from_ints(pts)
    ax, ay, aident = E.to_affine(batch)
    inner, offsets, w = prefix_scan_parts_affine(E, ax, ay, aident)
    idx = jnp.arange(n)
    full = E.add(
        JPoint(
            offsets.x[idx // w], offsets.y[idx // w], offsets.z[idx // w]
        ),
        JPoint(inner.x[idx], inner.y[idx], inner.z[idx]),
    )
    assert E.points_to_ints(full) == _running_sums(pts, curve)
