"""Mesh sharding tests on the 8-device virtual CPU mesh (conftest forces
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from halo2_liam_eagen_msm_tpu import argument as A
from halo2_liam_eagen_msm_tpu.fields import PALLAS
from halo2_liam_eagen_msm_tpu.ops.ec import JPoint, ec
from halo2_liam_eagen_msm_tpu.ops.msm import scalars_to_limbs
from halo2_liam_eagen_msm_tpu.parallel.mesh import (
    make_mesh,
    points_sharded_divisor_witness,
    sharded_divisor_witness,
    sharded_msm,
)
from halo2_liam_eagen_msm_tpu.utils import pyref

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


@pytest.mark.medium
def test_sharded_msm(rng):
    curve = PALLAS
    E = ec(curve)
    mesh = make_mesh(8)
    n = 16  # 2 per device
    pts_ints = pyref.random_points(rng, curve, n)
    scalars = [rng.randrange(1 << 32) for _ in range(n)]
    pts = E.points_from_ints(pts_ints)
    res = sharded_msm(
        curve, scalars_to_limbs(scalars, curve), pts, mesh, c=4, max_scalar_bits=32
    )
    got = E.points_to_ints(JPoint(res.x[None], res.y[None], res.z[None]))[0]
    assert got == pyref.ec_msm(scalars, pts_ints, curve)


def test_points_sharded_witness(rng):
    """Intra-round sharding: one merge tree with the point axis split over 8
    devices must be BIT-IDENTICAL to the single-chip tree."""
    from halo2_liam_eagen_msm_tpu.divisor import compute_divisor_witness_partial

    curve = PALLAS
    E = ec(curve)
    mesh = make_mesh(8)
    n = 32  # 4 per device
    pts_ints = pyref.random_points(rng, curve, n - 1)
    res = pyref.ec_msm([1] * (n - 1), pts_ints, curve)
    pts_ints.append(pyref.ec_neg(res, curve))  # close to the identity
    pts = E.points_from_ints(pts_ints)

    wtns, out = points_sharded_divisor_witness(curve, mesh, pts)
    assert bool(np.asarray(E.is_identity(out)).all())

    ref_w, ref_out = compute_divisor_witness_partial(curve, pts)
    assert np.array_equal(np.asarray(wtns.a), np.asarray(ref_w.a))
    assert np.array_equal(np.asarray(wtns.b), np.asarray(ref_w.b))


def test_round_sharded_witness(rng):
    curve = PALLAS
    E = ec(curve)
    mesh = make_mesh(8)
    base, n = 5, 4
    pts_ints = pyref.random_points(rng, curve, n)
    pts = E.points_from_ints(pts_ints)
    scalars = [rng.randrange(1 << 32) for _ in range(n)]
    digits = A.negbase_decompose_batch(
        A.ints_to_limbs(scalars), base, A.num_digits_for(curve, base)
    )[:, ::-1].T.astype("int32")
    round_pts, carry = A._rounds_and_carries(curve, base, jnp.asarray(digits), pts)
    wtns, outs = sharded_divisor_witness(curve, mesh, round_pts)
    assert bool(np.asarray(E.is_identity(outs)).all())
    # carry still equals the MSM oracle under sharding
    got = E.points_to_ints(JPoint(carry.x[None], carry.y[None], carry.z[None]))[0]
    assert got == pyref.ec_msm(scalars, pts_ints, curve)


def test_dist_ntt_pair(rng):
    """All-to-all-sharded ntt_dif/intt_dit over 8 devices must be
    BIT-IDENTICAL to the single-chip transforms (the butterfly network is
    positional; parallel/dist_ntt module docstring)."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from halo2_liam_eagen_msm_tpu.limbs import ints_to_mont_limbs
    from halo2_liam_eagen_msm_tpu.ops.ntt import intt_dit, ntt_dif
    from halo2_liam_eagen_msm_tpu.parallel import dist_ntt

    curve = PALLAS
    spec = curve.field
    mesh = make_mesh(8)
    D, logn = 8, 6
    n = 1 << logn
    vals = [rng.randrange(spec.p) for _ in range(n)]
    a = jnp.asarray(ints_to_mont_limbs(vals, spec))
    dc = dist_ntt.dist_consts(spec, logn, 3)

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(),),
             out_specs=P("data"), check_vma=False)
    def fwd(ar):
        return dist_ntt.fwd_from_replicated(spec, ar, "data", D, dc)

    spect = fwd(a)
    want = ntt_dif(spec, a)
    assert np.array_equal(np.asarray(spect), np.asarray(want))

    @partial(jax.shard_map, mesh=mesh, in_specs=(P("data"),),
             out_specs=P(), check_vma=False)
    def inv(xs):
        return dist_ntt.inv_to_replicated(spec, xs, "data", D, dc)

    back = inv(spect)
    assert np.array_equal(np.asarray(back), np.asarray(a))
    assert np.array_equal(np.asarray(back), np.asarray(intt_dit(spec, want)))


def test_points_sharded_witness_a2a(rng):
    """Top-of-tree with the fused merge's NTTs sharded via all_to_all: must
    stay bit-identical to the single-chip tree (VERDICT r3 item 3).

    Mesh of D=4: the top TWO merge levels' NTT sizes are 16 and 32, both
    >= D^2 = 16, so BOTH run the distributed tail (with D=8 the smallest
    engaging size is 64, whose limb-NTT graphs cost tens of minutes of
    XLA:CPU compile on the virtual mesh — same path, worse economics)."""
    from halo2_liam_eagen_msm_tpu.divisor import compute_divisor_witness_partial
    from halo2_liam_eagen_msm_tpu.parallel.mesh import (
        points_sharded_divisor_witness_a2a,
    )

    curve = PALLAS
    E = ec(curve)
    mesh = make_mesh(4)
    n = 32  # 8 per device; top levels la=5 (ntt 16) and la=9 (ntt 32)
    pts_ints = pyref.random_points(rng, curve, n - 1)
    res = pyref.ec_msm([1] * (n - 1), pts_ints, curve)
    pts_ints.append(pyref.ec_neg(res, curve))
    pts = E.points_from_ints(pts_ints)

    wtns, out = points_sharded_divisor_witness_a2a(
        curve, mesh, pts, dist_min_la=4)
    assert bool(np.asarray(E.is_identity(out)).all())

    ref_w, _ = compute_divisor_witness_partial(curve, pts)
    assert np.array_equal(np.asarray(wtns.a), np.asarray(ref_w.a))
    assert np.array_equal(np.asarray(wtns.b), np.asarray(ref_w.b))


@pytest.mark.medium
def test_contiguous_shard_transform_primitives(rng):
    """The sharded-coefficient merge's collective primitives, bit-exact on
    the virtual mesh: fwd_from_contiguous / inv_to_contiguous (one
    all_to_all replacing the replicated entry/exit) and reshard_double (the
    two-ppermute level-to-level size doubling)."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from halo2_liam_eagen_msm_tpu.limbs import ints_to_mont_limbs
    from halo2_liam_eagen_msm_tpu.ops.ntt import ntt_dif
    from halo2_liam_eagen_msm_tpu.parallel import dist_ntt

    curve = PALLAS
    spec = curve.field
    mesh = make_mesh(4)
    D, logn = 4, 4  # n=16=D^2: smallest engaging size (compile budget)
    n = 1 << logn
    vals = [rng.randrange(spec.p) for _ in range(n)]
    a = jnp.asarray(ints_to_mont_limbs(vals, spec))
    dc = dist_ntt.dist_consts(spec, logn, 2)

    # ONE shard_map (one XLA:CPU compile) covering all three primitives:
    # fwd spectrum, fwd->inv roundtrip, and the ppermute-pair reshard
    @partial(jax.shard_map, mesh=mesh, in_specs=(P("data"),),
             out_specs=(P("data"), P("data"), P("data")), check_vma=False)
    def all_checks(ac):
        sp = dist_ntt.fwd_from_contiguous(spec, ac, "data", D, dc)
        back = dist_ntt.inv_to_contiguous(spec, sp, "data", D, dc)
        return sp, back, dist_ntt.reshard_double(ac, "data", D)

    sp, back, resharded = all_checks(a)
    assert np.array_equal(np.asarray(sp), np.asarray(ntt_dif(spec, a)))
    assert np.array_equal(np.asarray(back), np.asarray(a))
    want = np.concatenate([np.asarray(a),
                           np.zeros_like(np.asarray(a))], axis=0)
    assert np.array_equal(np.asarray(resharded), want)


@pytest.mark.slow
def test_points_sharded_witness_coeff_sharded(rng):
    """coeff_sharded=True keeps level coefficients SHARDED between levels
    (dist_ntt.run_sharded_top_tree — the per-level all_gathers are replaced
    by ppermute reshards + one final gather): still bit-identical to the
    single-chip tree (DESIGN-dist-ntt refinement #1)."""
    from halo2_liam_eagen_msm_tpu.divisor import compute_divisor_witness_partial
    from halo2_liam_eagen_msm_tpu.parallel.mesh import (
        points_sharded_divisor_witness_a2a,
    )

    curve = PALLAS
    E = ec(curve)
    mesh = make_mesh(4)
    n = 32  # top levels la=5 (ntt 16, switch point) and la=9 (ntt 32,
    # exercising the reshard_double path between sharded levels)
    pts_ints = pyref.random_points(rng, curve, n - 1)
    res = pyref.ec_msm([1] * (n - 1), pts_ints, curve)
    pts_ints.append(pyref.ec_neg(res, curve))
    pts = E.points_from_ints(pts_ints)

    wtns, out = points_sharded_divisor_witness_a2a(
        curve, mesh, pts, dist_min_la=4, coeff_sharded=True)
    assert bool(np.asarray(E.is_identity(out)).all())

    ref_w, _ = compute_divisor_witness_partial(curve, pts)
    assert np.array_equal(np.asarray(wtns.a), np.asarray(ref_w.a))
    assert np.array_equal(np.asarray(wtns.b), np.asarray(ref_w.b))


def test_sharded_msm_2d(rng):
    """Hierarchical (dcn, ici) mesh: ICI-local reduce, one point per slice
    over DCN — result equals the exact oracle."""
    from halo2_liam_eagen_msm_tpu.parallel.mesh import make_mesh_2d, sharded_msm_2d

    curve = PALLAS
    E = ec(curve)
    mesh = make_mesh_2d(2, 4)
    n = 16
    pts_ints = pyref.random_points(rng, curve, n)
    scalars = [rng.randrange(1 << 32) for _ in range(n)]
    pts = E.points_from_ints(pts_ints)
    res = sharded_msm_2d(
        curve, scalars_to_limbs(scalars, curve), pts, mesh, c=4, max_scalar_bits=32
    )
    got = E.points_to_ints(JPoint(res.x[None], res.y[None], res.z[None]))[0]
    assert got == pyref.ec_msm(scalars, pts_ints, curve)


def test_hierarchical_witness(rng):
    """Rounds over DCN x points over ICI must be bit-identical to the
    single-chip (d, S) batched tree."""
    from halo2_liam_eagen_msm_tpu.divisor import compute_divisor_witness_partial
    from halo2_liam_eagen_msm_tpu.parallel.mesh import (
        hierarchical_divisor_witness,
        make_mesh_2d,
    )

    curve = PALLAS
    E = ec(curve)
    mesh = make_mesh_2d(2, 4)
    base, n = 3, 4  # slots = base + n + 1 = 8 = 2 * n_ici per round
    pts_ints = pyref.random_points(rng, curve, n)
    pts = E.points_from_ints(pts_ints)
    scalars = [rng.randrange(1 << 16) for _ in range(n)]
    digits = A.negbase_decompose_batch(
        A.ints_to_limbs(scalars), base, A.num_digits_for(curve, base)
    )[:, ::-1].T.astype("int32")[:2]  # two rounds: one per DCN slice
    round_pts, _ = A._rounds_and_carries(curve, base, jnp.asarray(digits), pts)
    wtns, outs = hierarchical_divisor_witness(curve, mesh, round_pts)
    assert bool(np.asarray(E.is_identity(outs)).all())
    ref_w, _ = compute_divisor_witness_partial(curve, round_pts)
    assert np.array_equal(np.asarray(wtns.a), np.asarray(ref_w.a))
    assert np.array_equal(np.asarray(wtns.b), np.asarray(ref_w.b))
