"""Regular functions and divisor witnesses — the core of the Eagen argument.

TPU-native re-design of the reference's divisor-witness engine
(/root/reference/src/regular_functions_utils.rs:220-551):

  * RegularFunction a(x) + y*b(x) is a pair of coefficient tensors
    (..., M, La, 16) / (..., M, Lb, 16) — batched over both the merge-tree
    population M and any leading dims (e.g. the argument's digit rounds)
  * `Propagation::group_merge`'s recursion + rayon `parallelize`
    (:380-405) becomes a LEVEL-SYNCHRONOUS loop: each level merges all
    consecutive pairs in one batched kernel; polynomial lengths double per
    level and are statically padded (La_k = 2^k + 1, Lb_k = 2^k)
  * data-dependent branches (identity points, degenerate lines, zero outputs)
    become masks; absent points are identity-padded slots — the algebra
    absorbs them exactly (empty propagations multiply in as the constant 1,
    reference :324-326)

Canonicalization note (documented spec): the reference builds line functions
from *Jacobian-derived* projective coordinates (:284-303, :426-431), so its
witness coefficients depend on halo2curves' internal Z values; only the
divisor (zero set) is representation-independent.  This framework instead
normalizes points to affine form first — line through (x1,y1,1), (x2,y2,1)
(identity = (0,1,0)) via the same cross-product formulas — making witness
coefficients a deterministic function of the input points.  The C++ oracle
implements the identical normalization; correctness against the reference is
established by the divisor property (witness vanishes on all inputs + output)
which both conventions share.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .fields import CurveSpec, N_LIMBS
from .ops.ec import EC, JPoint, ec
from .ops.ff import ff
from .ops.ntt import intt_dit, ntt, ntt_dif
from .ops import poly as P


class RF(NamedTuple):
    """Batched regular function a(x) + y*b(x): coefficient tensors
    (..., La, 16) and (..., Lb, 16)."""
    a: jnp.ndarray
    b: jnp.ndarray


class Level(NamedTuple):
    """One merge-tree level: M propagations (output point + witness)."""
    out: JPoint     # coords (..., M, 16)
    wtns: RF        # (..., M, La, 16), (..., M, Lb, 16)


# ---------------------------------------------------------------------------
# regular-function algebra (batched)
# ---------------------------------------------------------------------------

# Minimum incoming a-poly length for the fused eval-domain merge.  Below this
# the coefficient path's naive products win (mirrors poly.NAIVE_THRESHOLD: the
# big product's operands reach length >= 32 exactly when la >= 32).
FUSE_MIN_LA = 32


def rf_mul(curve: CurveSpec, f: RF, g: RF) -> RF:
    """(a1 + y b1)(a2 + y b2) with y^2 = x^3 + A x + B substituted
    (reference Mul impl :266-273)."""
    spec = curve.field
    k = ff(spec)
    a = P.mul_auto(spec, f.a, g.a)
    bb = P.mul_auto(spec, f.b, g.b)
    subst = _subst_poly(curve)  # x^3 + A x + B, len 4
    bb_s = P.mul_naive(spec, bb, jnp.broadcast_to(subst, bb.shape[:-2] + (4, N_LIMBS)))
    a_out = P.add_padded(spec, a, bb_s)
    ab = P.mul_auto(spec, f.a, g.b)
    ba = P.mul_auto(spec, f.b, g.a)
    b_out = P.add_padded(spec, ab, ba)
    return RF(a_out, b_out)


def _subst_poly(curve: CurveSpec):
    k = ff(curve.field)
    return np.stack(
        [k.const(curve.b), k.const(curve.a), k.const(0), k.const(1)]
    ).astype(np.uint32)


def rf_eval(curve: CurveSpec, f: RF, x, y):
    """Evaluate at affine (x, y) (reference ev_unchecked :235-237)."""
    k = ff(curve.field)
    return k.add(
        P.eval_poly(curve.field, f.a, x),
        k.mul(P.eval_poly(curve.field, f.b, x), y),
    )


def linefunc_affine(curve: CurveSpec, x1, y1, id1, x2, y2, id2):
    """Line through two canonical projective points (x, y, 1) / (0, 1, 0)
    for identity — cross-product coefficients (lx, ly, lz) with the line
    being lx*X + ly*Y + lz (reference linefunc :284-303, affine-normalized
    per the module docstring).  Returns (lx, ly, lz) limb tensors."""
    k = ff(curve.field)
    zero = jnp.zeros_like(x1)
    one = jnp.broadcast_to(jnp.asarray(k.one), x1.shape)
    ax = k.select(id1, zero, x1)
    ay = k.select(id1, one, y1)
    az = k.select(id1, zero, one)
    bx = k.select(id2, zero, x2)
    by = k.select(id2, one, y2)
    bz = k.select(id2, zero, one)
    lx = k.sub(k.mul(ay, bz), k.mul(az, by))
    ly = k.sub(k.mul(az, bx), k.mul(ax, bz))
    lz = k.sub(k.mul(ax, by), k.mul(ay, bx))
    return lx, ly, lz


def _line_rf(lx, ly, lz) -> RF:
    """Line to regular function: a-poly [lz, lx], b-poly [ly]
    (reference from_line :244-246)."""
    return RF(
        jnp.stack([lz, lx], axis=-2),
        ly[..., None, :],
    )


# ---------------------------------------------------------------------------
# seeds and merges
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _eval_domain_consts(curve: CurveSpec, logn: int):
    """Evaluation-domain constants for the fused merge at NTT size n = 2^logn:
    W[i] = w^rev(i) and S[i] = W[i]^3 + A W[i] + B (the y^2 substitution
    values) in Montgomery limb form, BIT-REVERSED order — the evaluation
    order the gather-free forward transform produces (ops/ntt.py ntt_dif;
    reordering the constants host-side is free, the on-device bit-reversal
    gather it replaces is not)."""
    from .limbs import ints_to_mont_limbs
    from .ops.ntt import _bitrev_perm

    spec = curve.field
    assert logn <= spec.s
    n = 1 << logn
    w = spec.omega_pow(spec.s - logn)
    ws = []
    x = 1
    for _ in range(n):
        ws.append(x)
        x = x * w % spec.p
    ws = [ws[j] for j in _bitrev_perm(logn)]
    svals = [(xj * xj % spec.p * xj + curve.a * xj + curve.b) % spec.p for xj in ws]
    W = np.asarray(ints_to_mont_limbs(ws, spec), dtype=np.uint32)
    S = np.asarray(ints_to_mont_limbs(svals, spec), dtype=np.uint32)
    return W, S


def _multi_affine(E: EC, pts_list):
    """Affine-normalize several point batches with ONE shared batch inversion."""
    f = E.f
    zs = jnp.stack([p.z for p in pts_list])
    flat = zs.reshape(-1, N_LIMBS)
    zinv = f.batch_inv(flat, axis=0).reshape(zs.shape)
    outs = []
    for i, p in enumerate(pts_list):
        zi = zinv[i]
        zi2 = f.sqr(zi)
        x = f.mul(p.x, zi2)
        y = f.mul(p.y, f.mul(zi, zi2))
        ident = E.is_identity(p)
        outs.append((f.select(ident, jnp.zeros_like(x), x),
                     f.select(ident, jnp.zeros_like(y), y),
                     ident))
    return outs


def seeds(curve: CurveSpec, pts: JPoint) -> Level:
    """Seed level from N points (N even; identity-pad if needed): consecutive
    pairs via from_pair semantics (reference :328-331, :319-326, :453-464):

      p1 != id             -> inputs {p1, p2}: line(p1, p2), output -(p1+p2)
      p1 == id, p2 != id   -> from_point(p2): line(p2, -p2), output -p2
      both id              -> empty: witness 1, output id

    In all cases output = -(p1 + p2) since identity contributes nothing."""
    E = ec(curve)
    k = ff(curve.field)
    p1 = _take_pts(pts, slice(0, None, 2))
    p2 = _take_pts(pts, slice(1, None, 2))
    id1 = E.is_identity(p1)
    id2 = E.is_identity(p2)

    out = E.neg(E.add(p1, p2))

    # line arguments: (p1, p2) normally; (p2, -p2) when p1 is the identity
    left = E.select(id1, p2, p1)
    right = E.select(id1, E.neg(p2), p2)
    (lxa, lya, ida), (lxb, lyb, idb) = _multi_affine(E, [left, right])
    lx, ly, lz = linefunc_affine(curve, lxa, lya, ida, lxb, lyb, idb)

    # degenerate: cross product vanished (projectively equal args, e.g. the
    # tangent case p1 == p2): recompute through c = -(left + right)
    deg = k.is_zero(lx) & k.is_zero(ly) & k.is_zero(lz)
    cpt = E.neg(E.add(left, right))
    (cx, cy, cid), = _multi_affine(E, [cpt])
    lx2, ly2, lz2 = linefunc_affine(curve, lxa, lya, ida, cx, cy, cid)
    lx = k.select(deg, lx2, lx)
    ly = k.select(deg, ly2, ly)
    lz = k.select(deg, lz2, lz)

    # both-identity slots: witness is the constant 1 (empty propagation)
    both = id1 & id2
    one = jnp.broadcast_to(jnp.asarray(k.one), lx.shape)
    zero = jnp.zeros_like(lx)
    lx = k.select(both, zero, lx)
    ly = k.select(both, zero, ly)
    lz = k.select(both, one, lz)

    return Level(out, _line_rf(lx, ly, lz))


def _take_pts(p: JPoint, sl) -> JPoint:
    return JPoint(p.x[..., sl, :], p.y[..., sl, :], p.z[..., sl, :])


def _take_level(lv: Level, sl) -> Level:
    return Level(
        _take_pts(lv.out, sl),
        RF(lv.wtns.a[..., sl, :, :], lv.wtns.b[..., sl, :, :]),
    )


def _pad_poly(arr, n):
    cur = arr.shape[-2]
    if cur == n:
        return arr
    return jnp.pad(arr, [(0, 0)] * (arr.ndim - 2) + [(0, n - cur), (0, 0)])


@lru_cache(maxsize=None)
def _fused_consts_dev(curve: CurveSpec, logn: int):
    """Device-resident constants for the fused merge at NTT size 2^logn:
    (W, S, fwd twiddles, inv twiddles, lm fwd tables, lm inv tables), each
    uploaded once and passed as jit OPERANDS — inlining them as HLO
    constants made production-size compile payloads tens of MB per level
    (rejected by the axon tunnel, HTTP 413).  The last two entries are the
    limb-major pallas-NTT stage tables (ops/pallas_ntt.tables_op)."""
    from .ops.ntt import twiddle_flat
    from .ops.pallas_ntt import tables_op

    W, S = _eval_domain_consts(curve, logn)
    lm_f = jax.tree_util.tree_map(jnp.asarray, tables_op(curve.field, logn, False))
    lm_i = jax.tree_util.tree_map(jnp.asarray, tables_op(curve.field, logn, True))
    return (jnp.asarray(W), jnp.asarray(S),
            twiddle_flat(curve.field, logn, False),
            twiddle_flat(curve.field, logn, True),
            lm_f, lm_i)


def fused_logn(la: int, lb: int) -> int:
    """NTT size exponent the fused merge uses for input lengths (la, lb)."""
    return (la + lb + 2 - 1).bit_length()


def merge_head(curve: CurveSpec, a_out: JPoint, b_out: JPoint):
    """The point/line/root computation shared by every merge flavor: from
    the two subtree output points, the merged output, the bypass mask, the
    degenerate-line flag, the (masked) line coefficients, the outputs'
    negated-y values and the division roots.  Split out of merge_pairs so
    the sharded-coefficient distributed merge (parallel/dist_ntt) can run
    it on replicated points while the polynomial tail is sharded."""
    E = ec(curve)
    k = ff(curve.field)

    out = E.add(a_out, b_out)
    bypass = E.is_identity(a_out) | E.is_identity(b_out)

    na, nb = E.neg(a_out), E.neg(b_out)
    (nax, nay, naid), (nbx, nby, nbid) = _multi_affine(E, [na, nb])
    lx, ly, lz = linefunc_affine(curve, nax, nay, naid, nbx, nby, nbid)

    # degenerate line (equal points, e.g. -a.out == -b.out): through c = a+b
    deg = k.is_zero(lx) & k.is_zero(ly) & k.is_zero(lz) & ~bypass
    (cx, cy, cid), = _multi_affine(E, [out])
    lx2, ly2, lz2 = linefunc_affine(curve, nax, nay, naid, cx, cy, cid)
    lx = k.select(deg, lx2, lx)
    ly = k.select(deg, ly2, ly)
    lz = k.select(deg, lz2, lz)

    # bypass slots: line = constant 1 so the product is just wtns_a * wtns_b
    one = jnp.broadcast_to(jnp.asarray(k.one), lx.shape)
    zero = jnp.zeros_like(lx)
    lx = k.select(bypass, zero, lx)
    ly = k.select(bypass, zero, ly)
    lz = k.select(bypass, one, lz)

    # roots for the divisions: the affine x of the (pre-negation) outputs —
    # x is negation-invariant so nax/nbx serve
    root_a = k.select(bypass, jnp.broadcast_to(jnp.asarray(k.one), nax.shape), nax)
    root_b = k.select(bypass, jnp.broadcast_to(jnp.asarray(k.one), nbx.shape), nbx)
    return out, bypass, deg, (lx, ly, lz), (nay, nby), (root_a, root_b)


def merge_pairs(curve: CurveSpec, a: Level, b: Level, consts=None,
                tail=None) -> Level:
    """Batched Propagation::merge (reference :333-360): for each slot,
      output = a.out + b.out
      witness = a.wtns * b.wtns * line(-a.out, -b.out) / (x-ax)(x-bx)
    with the division skipped (and the line set to 1) when either output is
    the identity (:340-342).

    tail: optional override for the numerator/division computation (same
    signature as _merge_tail_fused) — used by the distributed all_to_all
    merge (parallel/dist_ntt.make_sharded_tail) to shard the NTTs over a
    mesh axis while this head (points, lines, roots) stays replicated."""
    k = ff(curve.field)
    spec = curve.field

    out, bypass, deg, (lx, ly, lz), (nay, nby), (root_a, root_b) = \
        merge_head(curve, a.out, b.out)

    if tail is not None:
        return tail(curve, a, b, out, bypass, deg,
                    (lx, ly, lz), (nay, nby), (root_a, root_b), consts)

    if a.wtns.a.shape[-2] >= FUSE_MIN_LA:
        from . import config as _cfg

        tail_fn = (_merge_tail_fused_lm if _cfg.use_lm_merge()
                   else _merge_tail_fused)
        return tail_fn(
            curve, a, b, out, bypass, deg,
            (lx, ly, lz), (nay, nby), (root_a, root_b), consts,
        )

    s = rf_mul(curve, b.wtns, _line_rf(lx, ly, lz))
    num = rf_mul(curve, a.wtns, s)

    qa = P.kate_div(spec, P.kate_div(spec, num.a, root_a), root_b)
    qb = P.kate_div(spec, P.kate_div(spec, num.b, root_a), root_b)

    wa = k.select(bypass[..., None], num.a, qa)
    wb = k.select(bypass[..., None], num.b, qb)
    return Level(out, RF(wa, wb))


def _merge_tail_fused_lm(curve, a, b, out, bypass, deg, line, neg_ys, roots,
                         consts=None):
    """Limb-major twin of `_merge_tail_fused`: same math, same results, but
    every transform/pointwise op runs on (16, nb, 8, 128) limb-major data
    through ops/pallas_ntt — ONE layout transpose per operand at entry and
    one per result at exit, instead of one per field op.  Cuts the ~9 HBM
    passes per butterfly stage to ~3 (block stages) and runs all stride
    <= 512 stages in a single launch; measured motivation in
    docs/DESIGN-ntt-passes.md (the 2^20 round superlinearity, VERDICT r4
    item 2).  The 1/n inverse-NTT scale is folded into the denominator
    batch inversion (dinv = 1/(n*den)).
    """
    from .ops import pallas_ntt as PN

    k = ff(curve.field)
    spec = curve.field
    lx, ly, lz = line
    nay, nby = neg_ys
    root_a, root_b = roots

    la, lb = a.wtns.a.shape[-2], a.wtns.b.shape[-2]
    out_len_a = la + lb + 2
    out_len_b = la + lb + 1
    logn = fused_logn(la, lb)
    n = 1 << logn
    if consts is None:
        Wc, Sc = _eval_domain_consts(curve, logn)
        from .ops.pallas_ntt import tables_op
        W, S = jnp.asarray(Wc), jnp.asarray(Sc)
        lm_f = tables_op(spec, logn, False)
        lm_i = tables_op(spec, logn, True)
    else:
        W, S, _, _, lm_f, lm_i = consts

    lead = a.wtns.a.shape[:-2]          # (..., m2)
    e_shape = lead + (n,)

    def fwd(arr):
        return PN.ntt_dif_lm(spec, PN.to_lm(_pad_poly(arr, n)), logn, lm_f)

    fa1 = fwd(a.wtns.a)
    fb1 = fwd(a.wtns.b)
    fa2 = fwd(b.wtns.a)
    fb2 = fwd(b.wtns.b)

    total_pairs = int(np.prod(lead))
    S_lm = PN.bcast_table_lm(S, total_pairs)
    W_lm = PN.bcast_table_lm(W, total_pairs)
    lx_lm = PN.bcast_pairs_lm(lx, n)
    ly_lm = PN.bcast_pairs_lm(ly, n)
    lz_lm = PN.bcast_pairs_lm(lz, n)
    ra_lm = PN.bcast_pairs_lm(root_a, n)
    rb_lm = PN.bcast_pairs_lm(root_b, n)

    def mul(x, y):
        return PN.lm_mul(spec, x, y)

    def add(x, y):
        return PN.lm_add(spec, x, y)

    def sub(x, y):
        return PN.lm_sub(spec, x, y)

    pv = add(mul(fa1, fa2), mul(mul(fb1, fb2), S_lm))
    qv = add(mul(fa1, fb2), mul(fb1, fa2))
    lv = add(lz_lm, mul(lx_lm, W_lm))
    num_a_v = add(mul(pv, lv), mul(mul(qv, S_lm), ly_lm))
    num_b_v = add(mul(pv, ly_lm), mul(qv, lv))

    den = mul(sub(W_lm, ra_lm), sub(W_lm, rb_lm))
    # bypass slots: den = one, so after the folded 1/n scale the quotient
    # equals intt(num)/n — exactly the element-major tail's bypass result
    mask01 = jnp.broadcast_to(
        bypass[..., None].astype(jnp.uint32), bypass.shape + (N_LIMBS,))
    byp_lm = PN.bcast_pairs_lm(mask01, n)
    one_col = jnp.asarray(np.asarray(k.one, np.uint32)).reshape(
        N_LIMBS, 1, 1, 1)
    den = jnp.where(byp_lm != 0, one_col, den)
    # fold the inverse transforms' 1/n into the batch inversion
    n_mont = (n << 256) % spec.p
    den = PN.lm_mul_const(spec, den, n_mont)

    torsion = ~bypass & (k.is_zero(nay) | k.is_zero(nby))
    den_zero = jnp.any(jnp.all(den == 0, axis=0))
    unsafe = jnp.any(deg) | jnp.any(torsion) | den_zero

    def div_eval(num_a_v, num_b_v, den):
        den_em = PN.from_lm(den, (total_pairs, n))
        dinv_lm = PN.to_lm(k.batch_inv(den_em, axis=-2))
        wa = PN.from_lm(
            PN.intt_dit_lm(spec, PN.lm_mul(spec, num_a_v, dinv_lm),
                           logn, lm_i), lead + (n,))
        wb = PN.from_lm(
            PN.intt_dit_lm(spec, PN.lm_mul(spec, num_b_v, dinv_lm),
                           logn, lm_i), lead + (n,))
        return wa, wb

    def div_coeff(num_a_v, num_b_v, den):
        # exceptional inputs: exact coefficient-domain synthetic division
        # (element-major — this branch is cold)
        num_a = intt_dit(spec, PN.from_lm(num_a_v, e_shape), tws=tw_i_op)
        num_b = intt_dit(spec, PN.from_lm(num_b_v, e_shape), tws=tw_i_op)
        qa = P.kate_div(spec, P.kate_div(spec, num_a, root_a), root_b)
        qb = P.kate_div(spec, P.kate_div(spec, num_b, root_a), root_b)
        wa = k.select(bypass[..., None], num_a, qa)
        wb = k.select(bypass[..., None], num_b, qb)
        return wa, wb

    tw_i_op = consts[3] if consts is not None else None
    wa, wb = jax.lax.cond(unsafe, div_coeff, div_eval,
                          num_a_v, num_b_v, den)
    return Level(out, RF(wa[..., :out_len_a, :], wb[..., :out_len_b, :]))


def _merge_tail_fused(curve, a, b, out, bypass, deg, line, neg_ys, roots,
                      consts=None):
    """Fused evaluation-domain tail of `merge_pairs` for long polynomials.

    Computes the whole numerator wtns_a * wtns_b * line with a single NTT
    round trip — 4 forward NTTs, ~11 pointwise products (the y^2-substitution
    polynomial becomes the precomputed value vector S), 2 inverse NTTs —
    instead of one NTT per pairwise product (the coefficient path's
    3 x mul_fft = 9+ transforms).  The two kate divisions by (x - root) are
    also done pointwise: the merge numerator is *exactly* divisible by
    (x - ax)(x - bx) whenever (i) neither output is 2-torsion (y = 0), (ii)
    ax != bx (equal subtree outputs show up as the degenerate-line flag), and
    (iii) no root coincides with an NTT evaluation point (denominator zero).
    Under those conditions the pointwise quotient equals the reference's
    synthetic division (kate_division drops an identically-zero remainder).
    The rare violations are detected exactly and the whole level falls back
    to coefficient-domain synthetic division via lax.cond, so results are
    bit-identical to the coefficient path for every input.
    """
    k = ff(curve.field)
    spec = curve.field
    lx, ly, lz = line
    nay, nby = neg_ys
    root_a, root_b = roots

    la, lb = a.wtns.a.shape[-2], a.wtns.b.shape[-2]
    out_len_a = la + lb + 2  # deg(num.a) <= la+lb+1 (b1*b2*subst term)
    out_len_b = la + lb + 1
    logn = fused_logn(la, lb)
    n = 1 << logn
    if consts is None:
        Wc, Sc = _eval_domain_consts(curve, logn)
        W, S, tw_f, tw_i = (jnp.asarray(Wc), jnp.asarray(Sc), None, None)
    else:
        W, S, tw_f, tw_i = consts[:4]

    # gather-free transforms: everything below is pointwise in the
    # evaluation domain, so the shared bit-reversed order of ntt_dif is as
    # good as natural order and skips four N-row bit-reversal gathers
    fa1 = ntt_dif(spec, _pad_poly(a.wtns.a, n), tws=tw_f)
    fb1 = ntt_dif(spec, _pad_poly(a.wtns.b, n), tws=tw_f)
    fa2 = ntt_dif(spec, _pad_poly(b.wtns.a, n), tws=tw_f)
    fb2 = ntt_dif(spec, _pad_poly(b.wtns.b, n), tws=tw_f)

    # (a1 + y b1)(a2 + y b2) = P + y Q with y^2 -> S
    pv = k.add(k.mul(fa1, fa2), k.mul(k.mul(fb1, fb2), S))
    qv = k.add(k.mul(fa1, fb2), k.mul(fb1, fa2))
    # times the line (lz + lx x) + y ly
    lv = k.add(lz[..., None, :], k.mul(lx[..., None, :], W))
    lyv = ly[..., None, :]
    num_a_v = k.add(k.mul(pv, lv), k.mul(k.mul(qv, S), lyv))
    num_b_v = k.add(k.mul(pv, lyv), k.mul(qv, lv))

    den = k.mul(k.sub(W, root_a[..., None, :]), k.sub(W, root_b[..., None, :]))
    one_row = jnp.broadcast_to(jnp.asarray(k.one), den.shape)
    den = jnp.where(bypass[..., None, None], one_row, den)

    torsion = ~bypass & (k.is_zero(nay) | k.is_zero(nby))
    unsafe = jnp.any(deg) | jnp.any(torsion) | jnp.any(k.is_zero(den))

    def div_eval(num_a_v, num_b_v, den):
        dinv = k.batch_inv(den, axis=-2)
        wa = intt_dit(spec, k.mul(num_a_v, dinv), tws=tw_i)
        wb = intt_dit(spec, k.mul(num_b_v, dinv), tws=tw_i)
        return wa[..., :out_len_a, :], wb[..., :out_len_b, :]

    def div_coeff(num_a_v, num_b_v, den):
        num_a = intt_dit(spec, num_a_v, tws=tw_i)[..., :out_len_a, :]
        num_b = intt_dit(spec, num_b_v, tws=tw_i)[..., :out_len_b, :]
        qa = P.kate_div(spec, P.kate_div(spec, num_a, root_a), root_b)
        qb = P.kate_div(spec, P.kate_div(spec, num_b, root_a), root_b)
        wa = k.select(bypass[..., None], num_a, qa)
        wb = k.select(bypass[..., None], num_b, qb)
        return wa, wb

    wa, wb = jax.lax.cond(unsafe, div_coeff, div_eval, num_a_v, num_b_v, den)
    return Level(out, RF(wa, wb))


def merge_level(curve: CurveSpec, a_sem: int, b_sem: int, lv: Level,
                consts=None, tail=None) -> Level:
    """One level: merge consecutive pairs; odd tail passes through (padded).
    a_sem/b_sem: the level's semantic (mathematically maximal) output lengths
    — everything beyond is provably zero and trimmed to stop pad growth.
    consts: optional _fused_consts_dev tuple for the fused path (pass as jit
    operands at production sizes; None inlines them as constants).
    tail: optional merge-tail override (see merge_pairs)."""
    m = lv.out.x.shape[-2]
    m2 = m // 2
    a = _take_level(lv, slice(0, 2 * m2, 2))
    b = _take_level(lv, slice(1, 2 * m2, 2))
    merged = merge_pairs(curve, a, b, consts, tail=tail)
    merged = Level(
        merged.out,
        RF(merged.wtns.a[..., :a_sem, :], merged.wtns.b[..., :b_sem, :]),
    )
    if m % 2:
        tail = _take_level(lv, slice(2 * m2, m))
        la = merged.wtns.a.shape[-2]
        lb = merged.wtns.b.shape[-2]
        merged = Level(
            JPoint(
                jnp.concatenate([merged.out.x, tail.out.x], axis=-2),
                jnp.concatenate([merged.out.y, tail.out.y], axis=-2),
                jnp.concatenate([merged.out.z, tail.out.z], axis=-2),
            ),
            RF(
                jnp.concatenate(
                    [merged.wtns.a, _pad_poly(tail.wtns.a, la)], axis=-3
                ),
                jnp.concatenate(
                    [merged.wtns.b, _pad_poly(tail.wtns.b, lb)], axis=-3
                ),
            ),
        )
    return merged


_merge_level_jit = partial(jax.jit, static_argnums=(0, 1, 2))(merge_level)


@partial(jax.jit, static_argnums=(0,))
def _seeds_jit(curve: CurveSpec, pts: JPoint) -> Level:
    return seeds(curve, pts)


def compute_divisor_witness_partial(curve: CurveSpec, pts: JPoint):
    """Batched equivalent of the reference's compute_divisor_witness_partial
    (:453-467): returns (RF witness, output point) with output = -(sum pts).
    pts: JPoint with coords (..., N, 16); N odd is handled by identity
    padding (equivalent to the reference's from_point odd tail).

    The witness vanishes at every non-identity input and at the output."""
    n = pts.x.shape[-2]
    if n == 0:
        raise ValueError("empty point list")
    if n % 2:
        E = ec(curve)
        idp = E.identity(pts.x.shape[:-2] + (1,))
        pts = JPoint(
            jnp.concatenate([pts.x, idp.x], axis=-2),
            jnp.concatenate([pts.y, idp.y], axis=-2),
            jnp.concatenate([pts.z, idp.z], axis=-2),
        )
    lv = _seeds_jit(curve, pts)
    b_sem = 1  # seeds: a-len 2, b-len 1
    while lv.out.x.shape[-2] > 1:
        b_sem = 2 * b_sem
        la, lb = lv.wtns.a.shape[-2], lv.wtns.b.shape[-2]
        consts = (_fused_consts_dev(curve, fused_logn(la, lb))
                  if la >= FUSE_MIN_LA else None)
        lv = _merge_level_jit(curve, b_sem + 1, b_sem, lv, consts)
    out = JPoint(
        lv.out.x[..., 0, :], lv.out.y[..., 0, :], lv.out.z[..., 0, :]
    )
    wtns = RF(lv.wtns.a[..., 0, :, :], lv.wtns.b[..., 0, :, :])
    return wtns, out


def compute_divisor_witness(curve: CurveSpec, pts: JPoint) -> RF:
    """Reference compute_divisor_witness (:476-480): panics unless the points
    sum to zero (output == identity)."""
    wtns, out = compute_divisor_witness_partial(curve, pts)
    E = ec(curve)
    ok = np.asarray(E.is_identity(out))
    if not ok.all():
        raise AssertionError("points do not sum to the identity")
    return wtns


# ---------------------------------------------------------------------------
# naive line-arrangement witness (second oracle; reference :483-551)
# ---------------------------------------------------------------------------

class Arrangement(NamedTuple):
    """Lists of numerator (pos) and denominator (neg) lines, each a host-side
    list of (lx, ly, lz) canonical int triples."""
    pos: list
    neg: list


def compute_divisor_witness_naive_host(curve: CurveSpec, pts_ints) -> Arrangement:
    """Host-side exact replica of compute_divisor_witness_naive (:502-551):
    rounds of pairwise addition over pos/neg stacks (pop-from-end order as in
    the reference), accumulating line functions; terminates when each side
    has <= 1 point, with the same final assertions."""
    from .utils import pyref

    def line_ints(a, b):
        # same canonical affine cross product as linefunc_affine
        p = curve.field.p

        def coords(pt):
            return (0, 1, 0) if pt is None else (pt[0], pt[1], 1)

        ax, ay, az = coords(a)
        bx, by, bz = coords(b)
        lx = (ay * bz - az * by) % p
        ly = (az * bx - ax * bz) % p
        lz = (ax * by - ay * bx) % p
        if lx or ly or lz:
            return (lx, ly, lz)
        c = pyref.ec_neg(pyref.ec_add(a, b, curve), curve)
        cx, cy, cz = coords(c)
        return ((ay * cz - az * cy) % p, (az * cx - ax * cz) % p, (ax * cy - ay * cx) % p)

    pos = list(pts_ints)
    neg = []
    ret_pos, ret_neg = [], []
    tmp = []
    while len(pos) > 1 or len(neg) > 1:
        while len(pos) > 1:
            inc1 = pos.pop()
            if inc1 is not None:
                tmp.append((inc1, pos.pop()))
        # the reference drains tmp with pop() — REVERSED pair order — both
        # for the emitted lines and the sums pushed onto the other stack
        # (regular_functions_utils.rs:520-526)
        for (x, y) in reversed(tmp):
            q = pyref.ec_add(x, y, curve)
            ret_pos.append(line_ints(x, y))
            neg.append(pyref.ec_neg(q, curve))
        tmp = []
        while len(neg) > 1:
            inc1 = neg.pop()
            if inc1 is not None:
                tmp.append((inc1, neg.pop()))
        for (x, y) in reversed(tmp):
            q = pyref.ec_add(x, y, curve)
            ret_neg.append(line_ints(x, y))
            pos.append(pyref.ec_neg(q, curve))
        tmp = []
    if len(pos) == 1 and not neg:
        assert pos[0] is None
    elif len(neg) == 1 and not pos:
        assert neg[0] is None
    elif len(pos) == 1 and len(neg) == 1:
        assert pos[0] == neg[0]
    return Arrangement(ret_pos, ret_neg)


# ---------------------------------------------------------------------------
# device-side naive line-arrangement (production-size second oracle)
# ---------------------------------------------------------------------------

def _batch_affine_xy(E: EC, pts: JPoint):
    """(x_aff, y_aff, is_identity) for a (N,) batch (one shared inversion)."""
    (x, y, ident), = _multi_affine(E, [pts])
    return x, y, ident


def _line_pairs(curve: CurveSpec, E: EC, pa: JPoint, pb: JPoint, valid):
    """Canonical lines through pairs (pa[j], pb[j]) with the host replica's
    exact semantics: cross product on affine coords, degenerate recompute
    through c = -(a+b).  Invalid slots emit zeros."""
    k = ff(curve.field)
    ax, ay, aid = _batch_affine_xy(E, pa)
    bx, by, bid = _batch_affine_xy(E, pb)
    lx, ly, lz = linefunc_affine(curve, ax, ay, aid, bx, by, bid)
    deg = k.is_zero(lx) & k.is_zero(ly) & k.is_zero(lz)
    cpt = E.neg(E.add(pa, pb))
    cx, cy, cid = _batch_affine_xy(E, cpt)
    lx2, ly2, lz2 = linefunc_affine(curve, ax, ay, aid, cx, cy, cid)
    lx = k.select(deg, lx2, lx)
    ly = k.select(deg, ly2, ly)
    lz = k.select(deg, lz2, lz)
    vmask = valid[..., None]
    return (jnp.where(vmask, lx, 0), jnp.where(vmask, ly, 0),
            jnp.where(vmask, lz, 0))


def _pop_roles(is_id, cnt, cap):
    """Vectorize the reference's sequential pop automaton over one stack
    (regular_functions_utils.rs:512-517): walking TOP-DOWN, an identity in
    the inc1 slot is discarded, anything else pairs with the next element
    below (identity partners ARE consumed), and the walk stops with one
    element left (the bottom element is never an inc1).

    The walk is a 2-state machine (expecting inc1 / expecting partner)
    whose per-element transition depends only on that element:
      identity:     expect->expect, partner->expect   (constant-0 map)
      non-identity: expect->partner, partner->expect  (negation map)
    so the state at every position is an associative prefix composition of
    {const0, NOT} maps — log-depth, no sequential scan.

    is_id: (cap,) bool in BOTTOM-up stack order; cnt: live count.
    Returns (inc1, partner, kept) bool masks in stack order."""
    idx = jnp.arange(cap)
    live = idx < cnt
    # reversed (top-down) element stream
    rev = jnp.clip(cnt - 1 - idx, 0, cap - 1)
    id_r = jnp.where(live, is_id[rev], True)
    # transition maps as (image-of-0, image-of-1); identity elems = (0, 0),
    # others = (1, 0); padding beyond cnt = identity map (0, 1)
    f0 = jnp.where(live, jnp.where(id_r, 0, 1), 0)
    f1 = jnp.where(live, 0, 1)

    def compose(f, g):
        # (g o f): first f, then g — associative_scan composes left prefixes
        ff0, ff1 = f
        gg0, gg1 = g
        return (jnp.where(ff0 == 0, gg0, gg1), jnp.where(ff1 == 0, gg0, gg1))

    p0, _ = jax.lax.associative_scan(compose, (f0, f1))
    # state BEFORE element i (exclusive prefix applied to initial state 0)
    state = jnp.concatenate([jnp.zeros((1,), p0.dtype), p0[:-1]])
    partner_r = live & (state == 1)
    inc1_r = live & (state == 0) & ~id_r
    # the bottom element (rev position cnt-1) is never an inc1: the loop
    # exits at stack length 1 before examining it
    last = idx == (cnt - 1)
    inc1_r = inc1_r & ~last
    kept_r = live & last & (state == 0)
    # back to stack order (stack index s <-> top-down position cnt-1-s);
    # padding rows clip onto position 0 and must be masked off
    fwd = jnp.clip(cnt - 1 - idx, 0, cap - 1)
    live_s = idx < cnt
    return (inc1_r[fwd] & live_s, partner_r[fwd] & live_s,
            kept_r[fwd] & live_s)


@partial(jax.jit, static_argnums=(0,))
def _naive_round(curve: CurveSpec, px, py, pz, cnt):
    """One pairing round over ONE side's stack (bottom at index 0): exact
    reference pop semantics via _pop_roles, pair adds, canonical lines.

    Returns (kept stack (cap,), keep_cnt, -q sums in EMISSION order (the
    reference drains its tmp vec reversed), npair, lx, ly, lz)."""
    E = ec(curve)
    cap = px.shape[0]
    stack = JPoint(px, py, pz)
    is_id = E.is_identity(stack)
    inc1, partner, kept = _pop_roles(is_id, cnt, cap)

    # pair k (in pop order) = k-th inc1 from the TOP; its partner is the
    # next element below it.  Emission order is REVERSED pop order.
    idx = jnp.arange(cap)
    npair = jnp.sum(inc1.astype(jnp.int32))
    # top-down view: position i <-> stack index cnt-1-i (padding excluded)
    rev = jnp.clip(cnt - 1 - idx, 0, cap - 1)
    inc1_top = jnp.where(idx < cnt, inc1[rev], False)
    rank_top = jnp.cumsum(inc1_top.astype(jnp.int32)) - 1  # rank among inc1s
    emit = jnp.where(inc1_top, npair - 1 - rank_top, cap)  # reversed drain
    # order emission slots: slot k holds the inc1 whose emit == k
    order = jnp.argsort(emit.astype(jnp.int32))
    ia_stack = rev[order]  # first npair entries = inc1 stack indices
    pa = _take_pts(stack, jnp.clip(ia_stack, 0, cap - 1))
    pb = _take_pts(stack, jnp.clip(ia_stack - 1, 0, cap - 1))  # partner = below
    vpair = jnp.arange(cap) < npair
    q = E.add(pa, pb)
    neg_q = E.neg(q)
    # blank invalid slots to the identity so appended padding is inert
    neg_q = JPoint(
        jnp.where(vpair[:, None], neg_q.x, 0),
        jnp.where(vpair[:, None], neg_q.y, 0),
        jnp.where(vpair[:, None], neg_q.z, 0),
    )
    lx, ly, lz = _line_pairs(curve, E, pa, pb, vpair)

    # kept stack: the (at most one) kept element compacted to the bottom
    keep_cnt = jnp.sum(kept.astype(jnp.int32))
    korder = jnp.argsort(jnp.where(kept, 0, 1), stable=True)
    ks = _take_pts(stack, korder)
    kmask = (idx < keep_cnt)[:, None]
    return (jnp.where(kmask, ks.x, 0), jnp.where(kmask, ks.y, 0),
            jnp.where(kmask, ks.z, 0), keep_cnt,
            neg_q.x, neg_q.y, neg_q.z, npair, lx, ly, lz)


def compute_divisor_witness_naive_device(curve: CurveSpec, pts: JPoint,
                                         max_rounds: int | None = None):
    """Device-side compute_divisor_witness_naive (reference
    /root/reference/src/regular_functions_utils.rs:502-551): rounds of
    pairwise addition over pos/neg stacks, emitting one canonical line per
    pair — the production-size second oracle the host replica
    (compute_divisor_witness_naive_host) cannot reach (rayon-parallel in
    the reference, :519-535; batched kernels here).

    Pop order, identity-drop semantics, and the reference's reversed tmp
    drain are replicated exactly, so emitted lines are bit-identical to the
    host replica's Arrangement at any size (tests/test_divisor).

    pts: (N,) JPoint.  Returns (pos_lines, neg_lines): per processing round
    (lx, ly, lz, count) device tensors; flatten with
    naive_device_lines_to_ints."""
    n = pts.x.shape[0]
    cap = 2 * n + 4  # stacks only shrink in total population
    if max_rounds is None:
        max_rounds = 2 * max(1, n.bit_length()) + 4

    def mk(stack_pts):
        x = jnp.zeros((cap, N_LIMBS), jnp.uint32)
        y = jnp.zeros((cap, N_LIMBS), jnp.uint32)
        z = jnp.zeros((cap, N_LIMBS), jnp.uint32)
        if stack_pts is not None:
            x = x.at[:n].set(stack_pts.x)
            y = y.at[:n].set(stack_pts.y)
            z = z.at[:n].set(stack_pts.z)
        return [x, y, z,
                jnp.asarray(n if stack_pts is not None else 0, jnp.int32)]

    pos = mk(pts)
    neg = mk(None)
    pos_lines, neg_lines = [], []

    def append(side, qx, qy, qz, npair):
        cnt = side[3]
        j = jnp.arange(cap) - cnt
        take = (j >= 0) & (j < npair)
        src = jnp.clip(j, 0, cap - 1)
        side[0] = jnp.where(take[:, None], qx[src], side[0])
        side[1] = jnp.where(take[:, None], qy[src], side[1])
        side[2] = jnp.where(take[:, None], qz[src], side[2])
        side[3] = cnt + npair

    for _ in range(max_rounds):
        kx, ky, kz, kc, qx, qy, qz, npair, lx, ly, lz = _naive_round(
            curve, pos[0], pos[1], pos[2], pos[3])
        pos = [kx, ky, kz, kc]
        append(neg, qx, qy, qz, npair)
        pos_lines.append((lx, ly, lz, npair))

        kx, ky, kz, kc, qx, qy, qz, npair, lx, ly, lz = _naive_round(
            curve, neg[0], neg[1], neg[2], neg[3])
        neg = [kx, ky, kz, kc]
        append(pos, qx, qy, qz, npair)
        neg_lines.append((lx, ly, lz, npair))
    return pos_lines, neg_lines


def naive_device_lines_to_ints(curve: CurveSpec, lines):
    """Flatten per-round device line tensors to host int triples in the host
    replica's emission order (drops empty slots)."""
    from .limbs import mont_limbs_to_ints

    out = []
    for lx, ly, lz, cnt in lines:
        c = int(jax.device_get(cnt))
        if c == 0:
            continue
        xs = mont_limbs_to_ints(np.asarray(lx[:c]), curve.field)
        ys = mont_limbs_to_ints(np.asarray(ly[:c]), curve.field)
        zs = mont_limbs_to_ints(np.asarray(lz[:c]), curve.field)
        out.extend(zip(xs, ys, zs))
    return out
