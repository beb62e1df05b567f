"""Multi-chip sharding for the MSM witness pipeline.

The reference's only parallelism is a shared-memory rayon pool
(/root/reference/src/regular_functions_utils.rs:391; SURVEY.md §5) — the
distributed dimension here is new design mandated by BASELINE.json:

  * mesh: 1-D ("data",) over TPU chips (ICI); multi-host extends the same axis
  * MSM: points + scalars sharded on the data axis via shard_map; each chip
    runs the full local Pippenger on its shard, partial results are combined
    with an all_gather + log-depth point sum.  (Reducing per-chip RESULTS is
    strictly cheaper than reducing per-chip bucket tables — 3x16 words per
    chip on the wire — while mathematically identical.)
  * divisor witness: the argument's d digit rounds are embarrassingly
    parallel; round-batched tensors are sharded on the leading axis and the
    level-synchronous merges run SPMD under GSPMD propagation with no code
    changes (witness polys never cross chips).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import CurveSpec, N_LIMBS
from ..ops.ec import JPoint, ec
from ..ops.msm import best_multiexp, pick_window
from ..divisor import RF, compute_divisor_witness_partial


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_msm(
    curve: CurveSpec,
    scalars,
    pts: JPoint,
    mesh: Mesh,
    c: int | None = None,
    max_scalar_bits: int | None = None,
) -> JPoint:
    """MSM with points/scalars partitioned over the mesh's data axis.
    N must be divisible by the mesh size (pad with zero scalars upstream)."""
    E = ec(curve)
    n = scalars.shape[0]
    d = mesh.devices.size
    assert n % d == 0, "pad inputs to a multiple of the mesh size"
    axis = mesh.axis_names[0]
    if c is None:
        c = pick_window(n // d)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        # scan carries inside the local Pippenger start as unvarying
        # constants; skip the static varying-axis check
        check_vma=False,
    )
    def local(sc, px, py, pz):
        r = best_multiexp(curve, sc, JPoint(px, py, pz), c, max_scalar_bits)
        gx = jax.lax.all_gather(r.x, axis)  # (D, 16)
        gy = jax.lax.all_gather(r.y, axis)
        gz = jax.lax.all_gather(r.z, axis)
        s = E.sum(JPoint(gx, gy, gz), axis=0)
        return s.x, s.y, s.z

    x, y, z = local(scalars, pts.x, pts.y, pts.z)
    return JPoint(x, y, z)


def shard_rounds(mesh: Mesh, round_pts: JPoint) -> JPoint:
    """Place a (d, S) round-batched point tensor with the round axis sharded
    over the mesh; pads d to a mesh-size multiple with identity rounds
    (identity rounds produce the constant-1 witness — exact no-ops)."""
    axis = mesh.axis_names[0]
    dsize = mesh.devices.size
    d = round_pts.x.shape[0]
    pad = (-d) % dsize
    if pad:
        zx = jnp.zeros((pad,) + round_pts.x.shape[1:], round_pts.x.dtype)
        round_pts = JPoint(
            jnp.concatenate([round_pts.x, zx]),
            jnp.concatenate([round_pts.y, zx]),
            jnp.concatenate([round_pts.z, zx]),
        )
    sh = NamedSharding(mesh, P(axis, None, None))
    return JPoint(
        jax.device_put(round_pts.x, sh),
        jax.device_put(round_pts.y, sh),
        jax.device_put(round_pts.z, sh),
    )


def sharded_divisor_witness(curve: CurveSpec, mesh: Mesh, round_pts: JPoint):
    """Round-sharded batched divisor witnesses: same level-synchronous kernels
    as the single-chip path; GSPMD keeps the round axis sharded through every
    merge level (no cross-chip polynomial traffic)."""
    placed = shard_rounds(mesh, round_pts)
    return compute_divisor_witness_partial(curve, placed)


def points_sharded_divisor_witness(curve: CurveSpec, mesh: Mesh, pts: JPoint):
    """ONE round's merge tree with the POINT axis sharded over the mesh —
    the intra-round dimension a single 2^24-point round (BASELINE config 5)
    needs, which round-sharding cannot provide (SURVEY.md §7 step 8).

    Strategy: each chip runs the level-synchronous local tree over its
    contiguous S/D-point shard down to ONE propagation, the D propagations
    are all_gather'd over ICI (a-poly + b-poly + output point per chip —
    the only cross-chip traffic), and the top log2(D) merge levels run
    replicated on every chip.  Because the local chunks are contiguous and
    the pairing order is positional, the combined tree is EXACTLY the
    single-chip tree — coefficients are bit-identical to
    compute_divisor_witness_partial (asserted in tests and the driver
    dryrun).  Replicating the top levels costs O(S log D) redundant field
    muls but zero extra collectives; a fully distributed NTT (all_to_all)
    for the top levels is the config-5 scaling refinement.

    pts: (S,) JPoint with S divisible by 2 * mesh size (identity-pad).
    Returns (RF witness, output JPoint), replicated."""
    from ..divisor import Level, _merge_level_jit, _seeds_jit

    E = ec(curve)
    axis = mesh.axis_names[0]
    d = mesh.devices.size
    s = pts.x.shape[0]
    assert s % (2 * d) == 0, "pad the point list to a multiple of 2*mesh"
    s_local = s // d

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    def run(px, py, pz):
        lv = _seeds_jit(curve, JPoint(px, py, pz))
        b_sem = 1
        while lv.out.x.shape[-2] > 1:
            b_sem *= 2
            lv = _merge_level_jit(curve, b_sem + 1, b_sem, lv)
        ga = jax.lax.all_gather(lv.wtns.a[0], axis)  # (D, La, 16)
        gb = jax.lax.all_gather(lv.wtns.b[0], axis)
        gox = jax.lax.all_gather(lv.out.x[0], axis)  # (D, 16)
        goy = jax.lax.all_gather(lv.out.y[0], axis)
        goz = jax.lax.all_gather(lv.out.z[0], axis)
        top = Level(JPoint(gox, goy, goz), RF(ga, gb))
        bs = b_sem
        while top.out.x.shape[-2] > 1:
            bs *= 2
            top = _merge_level_jit(curve, bs + 1, bs, top)
        return (top.wtns.a[0], top.wtns.b[0],
                top.out.x[0], top.out.y[0], top.out.z[0])

    wa, wb, ox, oy, oz = run(pts.x, pts.y, pts.z)
    return RF(wa, wb), JPoint(ox, oy, oz)
