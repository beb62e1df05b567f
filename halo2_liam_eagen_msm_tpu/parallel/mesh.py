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


def make_mesh_2d(n_dcn: int, n_ici: int | None = None,
                 axes=("dcn", "ici")) -> Mesh:
    """Hierarchical (dcn, ici) mesh: the outer axis crosses hosts over the
    data-center network, the inner axis is a pod slice's ICI ring.

    Devices are grouped by their slice/process so the inner axis genuinely
    rides ICI: on real multislice TPU the DCN boundary follows slice
    membership, not jax.devices() list position — relying on list order can
    silently invert the traffic hierarchy (results stay correct, the DCN
    would just carry ICI-volume traffic).  Requires exactly n_dcn groups of
    n_ici devices (no silent truncation)."""
    devs = jax.devices()
    if n_ici is None:
        assert len(devs) % n_dcn == 0, (len(devs), n_dcn)
        n_ici = len(devs) // n_dcn
    assert len(devs) == n_dcn * n_ici, (
        f"need exactly {n_dcn}x{n_ici} devices, have {len(devs)}")
    by_group: dict = {}
    for d in devs:
        key = (getattr(d, "slice_index", None), getattr(d, "process_index", 0))
        by_group.setdefault(key, []).append(d)
    groups = [by_group[k] for k in sorted(by_group, key=str)]
    if len(groups) == n_dcn and all(len(g) == n_ici for g in groups):
        grid = np.array([sorted(g, key=lambda d: d.id) for g in groups])
    else:
        # single-slice / virtual-device platforms: group boundaries don't
        # exist, so contiguous id order is the only (and correct) choice
        grid = np.array(sorted(devs, key=lambda d: d.id)).reshape(
            n_dcn, n_ici)
    return Mesh(grid, axes)


def sharded_msm_2d(
    curve: CurveSpec,
    scalars,
    pts: JPoint,
    mesh: Mesh,
    c: int | None = None,
    max_scalar_bits: int | None = None,
) -> JPoint:
    """MSM over a (dcn, ici) mesh with a hierarchical reduction: points and
    scalars are sharded over BOTH axes (each chip runs its local Pippenger),
    partial results are reduced within each slice over ICI first, and only
    ONE point (3x16 words) per slice then crosses the DCN axis — the
    multi-host layout BASELINE config 5 requires (DCN bandwidth is ~100x
    below ICI; the algorithm's only inter-host traffic is the final
    per-slice partial)."""
    E = ec(curve)
    n = scalars.shape[0]
    d = mesh.devices.size
    assert n % d == 0, "pad inputs to a multiple of the mesh size"
    dcn, ici = mesh.axis_names
    if c is None:
        c = pick_window(n // d)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P((dcn, ici)), P((dcn, ici)), P((dcn, ici)), P((dcn, ici))),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def local(sc, px, py, pz):
        r = best_multiexp(curve, sc, JPoint(px, py, pz), c, max_scalar_bits)
        # stage 1: slice-local reduce over ICI
        s = E.sum(JPoint(
            jax.lax.all_gather(r.x, ici),
            jax.lax.all_gather(r.y, ici),
            jax.lax.all_gather(r.z, ici),
        ), axis=0)
        # stage 2: one partial per slice over DCN
        t = E.sum(JPoint(
            jax.lax.all_gather(s.x, dcn),
            jax.lax.all_gather(s.y, dcn),
            jax.lax.all_gather(s.z, dcn),
        ), axis=0)
        return t.x, t.y, t.z

    x, y, z = local(scalars, pts.x, pts.y, pts.z)
    return JPoint(x, y, z)


def hierarchical_divisor_witness(curve: CurveSpec, mesh: Mesh,
                                 round_pts: JPoint):
    """The argument's (d, S) round tensor over a (dcn, ici) mesh: digit
    ROUNDS sharded over DCN (rounds are independent — zero inter-round
    traffic crosses hosts), each round's POINT axis sharded over its slice's
    ICI (the intra-round dimension a 2^24-point round needs).  Composition
    of shard_rounds x points_sharded_divisor_witness; all_gathers ride ICI
    only.  Per-slice local trees run down to one propagation per (round,
    chip), the n_ici propagations per round are gathered over ICI, and the
    top log2(n_ici) levels run replicated within the slice — bit-identical
    to the single-chip (d, S) tree.

    round_pts: (d, S) with d % n_dcn == 0 (pad with identity rounds via
    shard_rounds-style zeros upstream) and S % (2 * n_ici) == 0.
    Returns (RF witness (d, La, 16), out JPoint (d, 16)): rounds sharded
    over dcn, replicated over ici."""
    from ..divisor import Level, _merge_level_jit, _seeds_jit

    dcn, ici = mesh.axis_names
    n_dcn, n_ici = mesh.devices.shape
    d, s = round_pts.x.shape[0], round_pts.x.shape[1]
    assert d % n_dcn == 0, "pad the round axis to a multiple of n_dcn"
    assert s % (2 * n_ici) == 0, "pad the point list to a multiple of 2*n_ici"
    # bit-identity with the single-chip tree additionally needs every local
    # chunk to pair off evenly at every level: a non-power-of-two local size
    # would diverge from the global positional pairing at the odd tails
    assert (s // n_ici) & (s // n_ici - 1) == 0, \
        "local point count must be a power of two for bit-identical pairing"
    assert n_ici & (n_ici - 1) == 0, "n_ici must be a power of two"

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(dcn, ici), P(dcn, ici), P(dcn, ici)),
        out_specs=(P(dcn), P(dcn), P(dcn), P(dcn), P(dcn)),
        check_vma=False,
    )
    def run(px, py, pz):
        # (d_local, S_local): the round axis rides the level engine as a
        # leading batch dim, exactly like the round-sharded path
        lv = _seeds_jit(curve, JPoint(px, py, pz))
        b_sem = 1
        while lv.out.x.shape[-2] > 1:
            b_sem *= 2
            lv = _merge_level_jit(curve, b_sem + 1, b_sem, lv)
        # population 1 per chip: gather this round's n_ici propagations
        ga = jax.lax.all_gather(lv.wtns.a[:, 0], ici, axis=1)
        gb = jax.lax.all_gather(lv.wtns.b[:, 0], ici, axis=1)
        gox = jax.lax.all_gather(lv.out.x[:, 0], ici, axis=1)
        goy = jax.lax.all_gather(lv.out.y[:, 0], ici, axis=1)
        goz = jax.lax.all_gather(lv.out.z[:, 0], ici, axis=1)
        top = Level(JPoint(gox, goy, goz), RF(ga, gb))
        bs = b_sem
        while top.out.x.shape[-2] > 1:
            bs *= 2
            top = _merge_level_jit(curve, bs + 1, bs, top)
        return (top.wtns.a[:, 0], top.wtns.b[:, 0],
                top.out.x[:, 0], top.out.y[:, 0], top.out.z[:, 0])

    wa, wb, ox, oy, oz = run(round_pts.x, round_pts.y, round_pts.z)
    return RF(wa, wb), JPoint(ox, oy, oz)


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
    # see hierarchical_divisor_witness: bit-identical positional pairing
    # needs power-of-two local chunks (and a power-of-two device count)
    assert s_local & (s_local - 1) == 0, \
        "local point count must be a power of two for bit-identical pairing"
    assert d & (d - 1) == 0, "mesh size must be a power of two"

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


def points_sharded_divisor_witness_a2a(curve: CurveSpec, mesh: Mesh,
                                       pts: JPoint,
                                       dist_min_la: int | None = None,
                                       coeff_sharded: bool = False):
    """points_sharded_divisor_witness with the top levels' fused-merge NTTs
    SHARDED over the mesh via all_to_all — the BASELINE config-5 scaling
    refinement (SURVEY §5 "top merge-tree levels and large NTTs sharded with
    all_to_all", §7 step 8; the distributed counterpart of best_fft inside
    the reference's merge, regular_functions_utils.rs:119-124,344).

    Same local trees as points_sharded_divisor_witness; above the gather,
    each level whose NTT size n satisfies n >= D^2 and whose a-length
    reaches dist_min_la (default divisor.FUSE_MIN_LA) runs the distributed
    tail (parallel/dist_ntt.make_sharded_tail): all 6 transforms and the
    pointwise eval-domain algebra are partitioned over the evaluation axis
    (1/D of the O(S log S) top-level work and of the ~4x NTT working set
    per chip), with ONE all_to_all per transform; only the level's
    input/output coefficient storage stays replicated.  Remaining small top
    levels run replicated exactly as before.  Coefficients are BIT-IDENTICAL
    to the single-chip tree (the butterfly network is positional; see
    dist_ntt module docstring).

    Exceptional merge inputs (degenerate line / 2-torsion output / root on
    an NTT point, probability ~2^-250 for honest inputs) cannot take the
    sequential coefficient fallback under the sharded axis; they are
    detected exactly and this wrapper reruns the whole round on the
    replicated path — results remain exact for every input.

    coeff_sharded=True additionally keeps the level COEFFICIENTS sharded
    between levels (dist_ntt.run_sharded_top_tree — DESIGN-dist-ntt
    refinement #1): the two per-level n-row all_gathers become one final
    gather per round, and per-chip level storage drops D-fold.  Still
    bit-identical to the single-chip tree.

    pts: (S,) JPoint, S divisible by 2 * mesh size, S/D a power of two.
    Returns (RF witness, output JPoint), replicated."""
    from ..divisor import (
        FUSE_MIN_LA,
        Level,
        _merge_level_jit,
        _seeds_jit,
        fused_logn,
        merge_level,
    )
    from . import dist_ntt

    if dist_min_la is None:
        dist_min_la = FUSE_MIN_LA
    axis = mesh.axis_names[0]
    D = mesh.devices.size
    s = pts.x.shape[0]
    assert s % (2 * D) == 0, "pad the point list to a multiple of 2*mesh"
    s_local = s // D
    assert s_local & (s_local - 1) == 0, \
        "local point count must be a power of two for bit-identical pairing"
    assert D & (D - 1) == 0, "mesh size must be a power of two"

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )
    def run(px, py, pz):
        lv = _seeds_jit(curve, JPoint(px, py, pz))
        b_sem = 1
        while lv.out.x.shape[-2] > 1:
            b_sem *= 2
            lv = _merge_level_jit(curve, b_sem + 1, b_sem, lv)
        ga = jax.lax.all_gather(lv.wtns.a[0], axis)
        gb = jax.lax.all_gather(lv.wtns.b[0], axis)
        gox = jax.lax.all_gather(lv.out.x[0], axis)
        goy = jax.lax.all_gather(lv.out.y[0], axis)
        goz = jax.lax.all_gather(lv.out.z[0], axis)
        top = Level(JPoint(gox, goy, goz), RF(ga, gb))
        unsafe_flags: list = []
        if coeff_sharded:
            top = dist_ntt.run_sharded_top_tree(
                curve, axis, D, top, b_sem, dist_min_la, unsafe_flags)
        else:
            tail = dist_ntt.make_sharded_tail(curve, axis, D, unsafe_flags)
            bs = b_sem
            while top.out.x.shape[-2] > 1:
                bs *= 2
                la, lb = top.wtns.a.shape[-2], top.wtns.b.shape[-2]
                n = 1 << fused_logn(la, lb)
                if la >= dist_min_la and n >= D * D:
                    top = merge_level(curve, bs + 1, bs, top, tail=tail)
                else:
                    top = merge_level(curve, bs + 1, bs, top)
        unsafe = jnp.zeros((), bool)
        for f in unsafe_flags:
            unsafe = unsafe | f
        return (top.wtns.a[0], top.wtns.b[0],
                top.out.x[0], top.out.y[0], top.out.z[0], unsafe)

    wa, wb, ox, oy, oz, unsafe = run(pts.x, pts.y, pts.z)
    if bool(jax.device_get(unsafe)):
        # exceptional inputs: exact replicated fallback (its in-graph
        # coefficient-domain division handles every case bit-exactly)
        return points_sharded_divisor_witness(curve, mesh, pts)
    return RF(wa, wb), JPoint(ox, oy, oz)
