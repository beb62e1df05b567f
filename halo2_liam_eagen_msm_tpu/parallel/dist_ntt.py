"""All-to-all-sharded NTT pair + distributed fused merge tail.

The merge tree's top levels have few propagations with LONG polynomials:
replicating them on every chip (parallel/mesh.py points_sharded paths) costs
O(S log D) redundant field muls per round and, at BASELINE config 5 sizes
(2^24 points), more HBM than a v5e chip has for the NTT working set.  This
module shards the transforms themselves — the distributed counterpart of the
`best_fft` calls inside the reference's merge
(/root/reference/src/regular_functions_utils.rs:119-124,344), per SURVEY §5
("top merge-tree levels ... sharded with all_to_all") and §7 step 8.

Design (bit-identical to the single-chip ntt_dif/intt_dit pair):

  The radix-2 butterfly network is positional — element i never moves, so
  splitting STAGES across devices preserves exact values.  With n = D * L
  rows contiguously sharded (device d owns rows [d*L, (d+1)*L)):

    * stages with half-span m/2 >= L ("top stages", there are log2(D) of
      them) pair rows on DIFFERENT devices.  In the all_to_all-TRANSPOSED
      layout — device d holds rows {dd*L + d*(L/D) + ll} for all dd — every
      top-stage butterfly is LOCAL along the dd axis.
    * stages with m <= L are local to contiguous L-blocks, and because
      (d*L + l) mod (m/2) = l mod (m/2), they are EXACTLY the single-chip
      size-L transform of the block (same twiddles: w_{2^s} is
      size-invariant).

  forward (ntt_dif semantics, natural coeffs -> bit-reversed spectrum):
      transposed slice (free: input is replicated) -> log2(D) top DIF
      stages -> ONE all_to_all to contiguous -> local size-L ntt_dif
  inverse (intt_dit semantics, bit-reversed spectrum -> natural coeffs):
      local size-L intt_dit stages -> ONE all_to_all to transposed ->
      log2(D) top DIT stages -> 1/n scale -> all_gather + index reorder

  Each transform moves n/D rows per device through one all_to_all; the
  inverse's all_gather (n rows in per device) replaces every device
  recomputing the whole merge.  See docs/DESIGN-dist-ntt.md for the
  bytes-on-wire and HBM model at 2^24.

All functions here must be called INSIDE jax.shard_map over mesh axis
`axis` with D devices, with n >= D^2 (so L % D == 0).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FieldSpec, N_LIMBS
from ..ops.ff import ff
from ..ops.ntt import _twiddles, intt_dit, ntt_dif


@lru_cache(maxsize=None)
def dist_consts(spec: FieldSpec, logn: int, logd: int):
    """HOST-side twiddle tables for the 2^logd-way distributed pair at size
    2^logn: (top_f, top_i, loc_f, loc_i).  top_f[j] / top_i[j] is the FULL
    (m/2, 16) stage table for m = 2^(logL+1+j) (each device dynamic-slices
    its rows — the tables total ~n rows; production multihost would shard
    them host-side, see docs/DESIGN-dist-ntt.md).

    Deliberately NUMPY, not device arrays: a device constant first created
    inside a shard_map trace is typed with that trace's Manual mesh, and an
    lru_cache would leak it into traces over OTHER meshes (observed: a
    4-device witness poisoning the 8-device transform probe).  Numpy
    converts to a fresh in-trace constant at every use site."""
    from ..ops.ntt import _twiddle_flat_host

    logL = logn - logd
    tf = _twiddles(spec, logn, False)
    ti = _twiddles(spec, logn, True)
    top_f = tuple(tf[s - 1] for s in range(logL + 1, logn + 1))
    top_i = tuple(ti[s - 1] for s in range(logL + 1, logn + 1))
    return (top_f, top_i,
            _twiddle_flat_host(spec, logL, False),
            _twiddle_flat_host(spec, logL, True))


def _top_tw(tab, md: int, L: int, LD: int, d):
    """(md/2, LD, 16) twiddle tensor in the transposed layout: rows
    r*L + d*LD + ll of the full stage table (the stage's twiddle index is
    the butterfly's lower row mod m/2 = (dd mod md/2)*L + d*LD + ll)."""
    parts = [
        jax.lax.dynamic_slice_in_dim(tab, r * L + d * LD, LD, axis=0)
        for r in range(md // 2)
    ]
    return jnp.stack(parts)


def _fwd_from_transposed(spec: FieldSpec, x, axis: str, D: int, consts, lead):
    """Shared forward tail: x (lead..., D, LD, 16) in the TRANSPOSED layout
    (x[dd, ll] = row dd*L + d*LD + ll of the natural-coefficient array) ->
    this device's contiguous (lead..., L, 16) spectrum shard."""
    k = ff(spec)
    top_f, _, loc_f, _ = consts
    LD = x.shape[-2]
    L = LD * D
    d = jax.lax.axis_index(axis)
    # top DIF stages, m = n .. 2L, local along the dd axis
    for j in range(len(top_f) - 1, -1, -1):
        md = 1 << (j + 1)
        tw = _top_tw(top_f[j], md, L, LD, d)
        x = x.reshape(lead + (D // md, 2, md // 2, LD, N_LIMBS))
        x0 = x[..., 0, :, :, :]
        x1 = x[..., 1, :, :, :]
        x = jnp.stack([k.add(x0, x1), k.mul(tw, k.sub(x0, x1))], axis=-4)
    x = x.reshape(lead + (D, LD, N_LIMBS))
    # to contiguous: device d receives chunk d of every dd -> rows [d*L, (d+1)*L)
    sa = len(lead)
    x = jax.lax.all_to_all(x, axis, split_axis=sa, concat_axis=sa)
    x = x.reshape(lead + (L, N_LIMBS))
    return ntt_dif(spec, x, tws=loc_f)


def fwd_from_replicated(spec: FieldSpec, a, axis: str, D: int, consts):
    """a: (..., n, 16) REPLICATED natural coefficients.  Returns this
    device's (..., L, 16) contiguous shard — rows [d*L, (d+1)*L) — of the
    single-chip ntt_dif(a) spectrum, bit-identically."""
    _, _, loc_f, _ = consts
    n = a.shape[-2]
    if D == 1:
        return ntt_dif(spec, a, tws=loc_f)
    L = n // D
    LD = L // D
    assert L % D == 0, "need n >= D^2 for the transposed layout"
    lead = a.shape[:-2]
    d = jax.lax.axis_index(axis)
    # transposed slice of the replicated input: x[dd, ll] = a[dd*L + d*LD + ll]
    ar = a.reshape(lead + (D, D, LD, N_LIMBS))
    x = jax.lax.dynamic_index_in_dim(ar, d, axis=len(lead) + 1, keepdims=False)
    return _fwd_from_transposed(spec, x, axis, D, consts, lead)


def fwd_from_contiguous(spec: FieldSpec, xc, axis: str, D: int, consts):
    """xc: (..., L, 16) CONTIGUOUS shard (rows [d*L, (d+1)*L)) of an
    n = D*L natural-coefficient array.  Returns this device's contiguous
    spectrum shard, bit-identical to fwd_from_replicated on the assembled
    array.  One extra all_to_all (contiguous -> transposed) vs the
    replicated entry; no all_gather anywhere."""
    _, _, loc_f, _ = consts
    if D == 1:
        return ntt_dif(spec, xc, tws=loc_f)
    L = xc.shape[-2]
    LD = L // D
    assert L % D == 0, "need n >= D^2 for the transposed layout"
    lead = xc.shape[:-2]
    sa = len(lead)
    # contiguous -> transposed: my chunk j (local rows [j*LD, (j+1)*LD) =
    # global rows d*L + j*LD + ll) goes to device j; received[dd] = device
    # dd's chunk d = rows dd*L + d*LD + ll — exactly the transposed layout
    x = xc.reshape(lead + (D, LD, N_LIMBS))
    x = jax.lax.all_to_all(x, axis, split_axis=sa, concat_axis=sa)
    return _fwd_from_transposed(spec, x, axis, D, consts, lead)


def _inv_to_transposed(spec: FieldSpec, xloc, axis: str, D: int, consts,
                       scale: bool):
    """Shared inverse head: xloc (..., L, 16) contiguous spectrum shard ->
    (lead..., D, LD, 16) natural coefficients in the TRANSPOSED layout
    (result[dd, ll] = row dd*L + d*LD + ll)."""
    k = ff(spec)
    _, top_i, _, loc_i = consts
    L = xloc.shape[-2]
    n = L * D
    LD = L // D
    assert L % D == 0, "need n >= D^2 for the transposed layout"
    lead = xloc.shape[:-2]
    d = jax.lax.axis_index(axis)
    x = intt_dit(spec, xloc, scale=False, tws=loc_i)  # local stages m=2..L
    # to transposed: x[dd, ll] = rows dd*L + d*LD + ll
    sa = len(lead)
    x = x.reshape(lead + (D, LD, N_LIMBS))
    x = jax.lax.all_to_all(x, axis, split_axis=sa, concat_axis=sa)
    # top DIT stages, m = 2L .. n
    for j in range(len(top_i)):
        md = 1 << (j + 1)
        tw = _top_tw(top_i[j], md, L, LD, d)
        x = x.reshape(lead + (D // md, 2, md // 2, LD, N_LIMBS))
        even = x[..., 0, :, :, :]
        odd = x[..., 1, :, :, :]
        t = k.mul(tw, odd)
        x = jnp.stack([k.add(even, t), k.sub(even, t)], axis=-4)
    x = x.reshape(lead + (D, LD, N_LIMBS))
    if scale:
        inv_n = k.const(pow(n, spec.p - 2, spec.p))
        x = k.mul(x, jnp.broadcast_to(jnp.asarray(inv_n), x.shape))
    return x


def inv_to_replicated(spec: FieldSpec, xloc, axis: str, D: int, consts,
                      scale: bool = True):
    """xloc: (..., L, 16) contiguous shard of a bit-reversed spectrum.
    Returns (..., n, 16) REPLICATED natural coefficients — bit-identical to
    single-chip intt_dit on the assembled spectrum."""
    _, _, _, loc_i = consts
    if D == 1:
        return intt_dit(spec, xloc, scale=scale, tws=loc_i)
    L = xloc.shape[-2]
    n = L * D
    lead = xloc.shape[:-2]
    x = _inv_to_transposed(spec, xloc, axis, D, consts, scale)
    # replicate: row i = dd*L + c*LD + ll -> order axes (dd, c, ll)
    g = jax.lax.all_gather(x, axis)          # (c, lead..., dd, LD, 16)
    g = jnp.moveaxis(g, 0, -3)               # (lead..., dd, c, LD, 16)
    return g.reshape(lead + (n, N_LIMBS))


def inv_to_contiguous(spec: FieldSpec, xloc, axis: str, D: int, consts,
                      scale: bool = True):
    """xloc: (..., L, 16) contiguous shard of a bit-reversed spectrum.
    Returns the (..., L, 16) CONTIGUOUS shard (rows [d*L, (d+1)*L)) of the
    natural coefficients — one all_to_all instead of inv_to_replicated's
    n-rows-per-device all_gather."""
    _, _, _, loc_i = consts
    if D == 1:
        return intt_dit(spec, xloc, scale=scale, tws=loc_i)
    lead = xloc.shape[:-2]
    sa = len(lead)
    x = _inv_to_transposed(spec, xloc, axis, D, consts, scale)
    # transposed -> contiguous: send chunk dd to device dd; received[j] =
    # device j's chunk d = rows d*L + j*LD + ll, in (j, ll) order =
    # contiguous rows [d*L, (d+1)*L)
    x = jax.lax.all_to_all(x, axis, split_axis=sa, concat_axis=sa)
    return x.reshape(lead + (x.shape[-3] * x.shape[-2], N_LIMBS))


def reshard_double(x, axis: str, D: int):
    """Contiguous coefficient shards at array size n -> contiguous shards at
    size 2n (zero-extension): device t's new shard (2*Lc rows) is
    [old shard 2t ; old shard 2t+1], devices t >= D/2 hold the zero upper
    half.  Two ppermutes of one shard each — the level-to-level reshard of
    the sharded-coefficient merge (NTT size doubles per level).

    x: (..., Lc, 16) rows [d*Lc, (d+1)*Lc) of the size-n array."""
    perm_even = [(2 * t, t) for t in range(D // 2)]
    perm_odd = [(2 * t + 1, t) for t in range(D // 2)]
    lo = jax.lax.ppermute(x, axis, perm_even)   # zeros where no source
    hi = jax.lax.ppermute(x, axis, perm_odd)
    return jnp.concatenate([lo, hi], axis=-2)


def make_sharded_tail(curve, axis: str, D: int, unsafe_out: list):
    """Distributed twin of divisor._merge_tail_fused for use as the `tail`
    hook of divisor.merge_pairs inside shard_map: the 4 forward NTTs, all
    pointwise eval-domain algebra (y^2-substitution, line product,
    (x-ax)(x-bx) division) and the 2 inverse NTTs run SHARDED over the
    evaluation axis; inputs/outputs stay replicated (storage is cheap, the
    ~4x NTT working set is what must shard).

    Exceptional inputs (degenerate line / 2-torsion output / root on an
    evaluation point) cannot be fixed up locally — the coefficient-domain
    kate division is a sequential scan over the sharded axis — so their
    (psum-reduced) flag is appended to `unsafe_out`; the caller must check
    it and rerun exceptional inputs on the replicated path.  Honest random
    inputs hit it with probability ~2^-250."""
    from ..divisor import RF, Level, _eval_domain_consts, fused_logn

    spec = curve.field
    k = ff(spec)

    def tail(curve_, a, b, out, bypass, deg, line, neg_ys, roots, _consts):
        lx, ly, lz = line
        nay, nby = neg_ys
        root_a, root_b = roots
        la, lb = a.wtns.a.shape[-2], a.wtns.b.shape[-2]
        out_len_a = la + lb + 2
        out_len_b = la + lb + 1
        logn = fused_logn(la, lb)
        n = 1 << logn
        L = n // D
        dc = dist_consts(spec, logn, D.bit_length() - 1)
        Wc, Sc = _eval_domain_consts(curve_, logn)
        d = jax.lax.axis_index(axis)
        W = jax.lax.dynamic_slice_in_dim(jnp.asarray(Wc), d * L, L, axis=0)
        S = jax.lax.dynamic_slice_in_dim(jnp.asarray(Sc), d * L, L, axis=0)

        def pad(arr):
            cur = arr.shape[-2]
            return jnp.pad(arr, [(0, 0)] * (arr.ndim - 2)
                           + [(0, n - cur), (0, 0)])

        fa1 = fwd_from_replicated(spec, pad(a.wtns.a), axis, D, dc)
        fb1 = fwd_from_replicated(spec, pad(a.wtns.b), axis, D, dc)
        fa2 = fwd_from_replicated(spec, pad(b.wtns.a), axis, D, dc)
        fb2 = fwd_from_replicated(spec, pad(b.wtns.b), axis, D, dc)

        pv = k.add(k.mul(fa1, fa2), k.mul(k.mul(fb1, fb2), S))
        qv = k.add(k.mul(fa1, fb2), k.mul(fb1, fa2))
        lv = k.add(lz[..., None, :], k.mul(lx[..., None, :], W))
        lyv = ly[..., None, :]
        num_a_v = k.add(k.mul(pv, lv), k.mul(k.mul(qv, S), lyv))
        num_b_v = k.add(k.mul(pv, lyv), k.mul(qv, lv))

        den = k.mul(k.sub(W, root_a[..., None, :]),
                    k.sub(W, root_b[..., None, :]))
        one_row = jnp.broadcast_to(jnp.asarray(k.one), den.shape)
        den = jnp.where(bypass[..., None, None], one_row, den)

        torsion = ~bypass & (k.is_zero(nay) | k.is_zero(nby))
        local_zero = jnp.any(k.is_zero(den))
        unsafe = (jnp.any(deg) | jnp.any(torsion)
                  | (jax.lax.psum(local_zero.astype(jnp.int32), axis) > 0))
        unsafe_out.append(unsafe)

        dinv = k.batch_inv(den, axis=-2)
        wa = inv_to_replicated(spec, k.mul(num_a_v, dinv), axis, D, dc)
        wb = inv_to_replicated(spec, k.mul(num_b_v, dinv), axis, D, dc)
        return Level(out, RF(wa[..., :out_len_a, :], wb[..., :out_len_b, :]))

    return tail


# ---------------------------------------------------------------------------
# sharded-coefficient top-of-tree (DESIGN-dist-ntt refinement #1)
# ---------------------------------------------------------------------------

def sharded_merge_level_coeffs(curve, axis: str, D: int, out_pts,
                               wa_sh, wb_sh, la: int, lb: int,
                               a_sem: int, b_sem: int, unsafe_out: list):
    """One merge level with coefficient-SHARDED witness I/O: nothing is
    replicated between levels except the (tiny) output points — the
    per-level all_gathers of make_sharded_tail are gone (DESIGN-dist-ntt
    refinement #1).  Wire per level: the transforms' all_to_alls plus the
    two-ppermute reshard, all moving n/D rows per device; HBM per chip for
    the level's inputs/outputs drops D-fold.

    out_pts: replicated (m, 16) JPoint of the current population (m even).
    wa_sh / wb_sh: (m, Lc, 16) CONTIGUOUS shards (rows [d*Lc, (d+1)*Lc)) of
    each propagation's size-(D*Lc) zero-extended coefficient array.
    la / lb: the inputs' semantic lengths; a_sem / b_sem: the level's
    semantic output lengths (merge_level's trim bound — rows beyond are
    provably zero for honest inputs, so no physical trim is needed).

    Returns (out_pts', wa_sh', wb_sh', n) with the outputs sharded at this
    level's NTT size n.  Exceptional inputs set the psum-reduced flag
    appended to unsafe_out (caller reruns on the replicated path) —
    identical detection to make_sharded_tail."""
    from ..divisor import _eval_domain_consts, fused_logn, merge_head
    from ..ops.ec import JPoint

    spec = curve.field
    k = ff(spec)

    a_out = JPoint(out_pts.x[0::2], out_pts.y[0::2], out_pts.z[0::2])
    b_out = JPoint(out_pts.x[1::2], out_pts.y[1::2], out_pts.z[1::2])
    out, bypass, deg, (lx, ly, lz), (nay, nby), (root_a, root_b) = \
        merge_head(curve, a_out, b_out)

    n = 1 << fused_logn(la, lb)
    n_prev = D * wa_sh.shape[-2]
    assert n in (n_prev, 2 * n_prev), (n, n_prev)
    L = n // D
    out_len_a = la + lb + 2
    out_len_b = la + lb + 1
    assert a_sem >= 1 and out_len_a <= n and a_sem <= out_len_a
    dc = dist_consts(spec, n.bit_length() - 1, D.bit_length() - 1)
    Wc, Sc = _eval_domain_consts(curve, n.bit_length() - 1)
    d = jax.lax.axis_index(axis)
    W = jax.lax.dynamic_slice_in_dim(jnp.asarray(Wc), d * L, L, axis=0)
    S = jax.lax.dynamic_slice_in_dim(jnp.asarray(Sc), d * L, L, axis=0)

    def pair_shards(arr):
        a_half, b_half = arr[0::2], arr[1::2]
        if n == 2 * n_prev:
            a_half = reshard_double(a_half, axis, D)
            b_half = reshard_double(b_half, axis, D)
        return a_half, b_half

    wa_a, wa_b = pair_shards(wa_sh)   # a-side / b-side a-polys, (m/2, L, 16)
    wb_a, wb_b = pair_shards(wb_sh)

    fa1 = fwd_from_contiguous(spec, wa_a, axis, D, dc)
    fb1 = fwd_from_contiguous(spec, wb_a, axis, D, dc)
    fa2 = fwd_from_contiguous(spec, wa_b, axis, D, dc)
    fb2 = fwd_from_contiguous(spec, wb_b, axis, D, dc)

    pv = k.add(k.mul(fa1, fa2), k.mul(k.mul(fb1, fb2), S))
    qv = k.add(k.mul(fa1, fb2), k.mul(fb1, fa2))
    lv = k.add(lz[..., None, :], k.mul(lx[..., None, :], W))
    lyv = ly[..., None, :]
    num_a_v = k.add(k.mul(pv, lv), k.mul(k.mul(qv, S), lyv))
    num_b_v = k.add(k.mul(pv, lyv), k.mul(qv, lv))

    den = k.mul(k.sub(W, root_a[..., None, :]),
                k.sub(W, root_b[..., None, :]))
    one_row = jnp.broadcast_to(jnp.asarray(k.one), den.shape)
    den = jnp.where(bypass[..., None, None], one_row, den)

    torsion = ~bypass & (k.is_zero(nay) | k.is_zero(nby))
    local_zero = jnp.any(k.is_zero(den))
    unsafe = (jnp.any(deg) | jnp.any(torsion)
              | (jax.lax.psum(local_zero.astype(jnp.int32), axis) > 0))
    unsafe_out.append(unsafe)

    dinv = k.batch_inv(den, axis=-2)
    wa_new = inv_to_contiguous(spec, k.mul(num_a_v, dinv), axis, D, dc)
    wb_new = inv_to_contiguous(spec, k.mul(num_b_v, dinv), axis, D, dc)
    return out, wa_new, wb_new, n


def run_sharded_top_tree(curve, axis: str, D: int, top, bs: int,
                         min_la: int, unsafe_out: list):
    """Run a replicated Level `top` (population a power of two) to
    population 1 with the merge tail's coefficients SHARDED between levels.
    Levels too small to shard (la < min_la or NTT size < D^2) run the
    replicated merge_level as before; at the switch the replicated
    coefficients are sliced into contiguous shards (free — no collective),
    and only the FINAL witness is all_gather'd back (one n-row gather per
    round instead of two per level).

    Returns a replicated Level at population 1 (witness trimmed to the
    semantic lengths).  bs: the entering b_sem.  Bit-identical to the
    replicated tree for honest inputs; exceptional inputs flag unsafe_out."""
    from ..divisor import (RF, Level, _pad_poly, fused_logn, merge_level)
    from ..ops.ec import JPoint

    # replicated phase
    while top.out.x.shape[-2] > 1:
        la, lb = top.wtns.a.shape[-2], top.wtns.b.shape[-2]
        if la >= min_la and (1 << fused_logn(la, lb)) >= D * D:
            break
        bs *= 2
        top = merge_level(curve, bs + 1, bs, top)
    if top.out.x.shape[-2] == 1:
        return top

    # switch: slice this device's contiguous shards of the zero-extended
    # coefficient arrays at the UPCOMING level's NTT size
    la, lb = top.wtns.a.shape[-2], top.wtns.b.shape[-2]
    n = 1 << fused_logn(la, lb)
    L = n // D
    d = jax.lax.axis_index(axis)
    wa_sh = jax.lax.dynamic_slice_in_dim(
        _pad_poly(top.wtns.a, n), d * L, L, axis=-2)
    wb_sh = jax.lax.dynamic_slice_in_dim(
        _pad_poly(top.wtns.b, n), d * L, L, axis=-2)
    out_pts = top.out

    while out_pts.x.shape[-2] > 1:
        bs *= 2
        out_pts, wa_sh, wb_sh, n_lvl = sharded_merge_level_coeffs(
            curve, axis, D, out_pts, wa_sh, wb_sh, la, lb,
            bs + 1, bs, unsafe_out)
        la, lb = bs + 1, bs

    # population 1: one final all_gather to replicate the witness
    g_a = jax.lax.all_gather(wa_sh, axis)    # (D, 1, L, 16)
    g_b = jax.lax.all_gather(wb_sh, axis)
    wa = jnp.moveaxis(g_a, 0, -3).reshape(
        wa_sh.shape[:-2] + (n_lvl, N_LIMBS))
    wb = jnp.moveaxis(g_b, 0, -3).reshape(
        wb_sh.shape[:-2] + (n_lvl, N_LIMBS))
    return Level(out_pts, RF(wa[..., :la, :], wb[..., :lb, :]))
