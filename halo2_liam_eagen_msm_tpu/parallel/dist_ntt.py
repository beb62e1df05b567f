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


def fwd_from_replicated(spec: FieldSpec, a, axis: str, D: int, consts):
    """a: (..., n, 16) REPLICATED natural coefficients.  Returns this
    device's (..., L, 16) contiguous shard — rows [d*L, (d+1)*L) — of the
    single-chip ntt_dif(a) spectrum, bit-identically."""
    k = ff(spec)
    top_f, _, loc_f, _ = consts
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


def inv_to_replicated(spec: FieldSpec, xloc, axis: str, D: int, consts,
                      scale: bool = True):
    """xloc: (..., L, 16) contiguous shard of a bit-reversed spectrum.
    Returns (..., n, 16) REPLICATED natural coefficients — bit-identical to
    single-chip intt_dit on the assembled spectrum."""
    k = ff(spec)
    _, top_i, _, loc_i = consts
    if D == 1:
        return intt_dit(spec, xloc, scale=scale, tws=loc_i)
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
    # replicate: row i = dd*L + c*LD + ll -> order axes (dd, c, ll)
    g = jax.lax.all_gather(x, axis)          # (c, lead..., dd, LD, 16)
    g = jnp.moveaxis(g, 0, -3)               # (lead..., dd, c, LD, 16)
    return g.reshape(lead + (n, N_LIMBS))


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
