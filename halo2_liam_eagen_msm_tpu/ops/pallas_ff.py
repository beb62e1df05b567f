"""Pallas TPU kernels for field and curve arithmetic.

This is the production compute path on TPU (the jnp limb path in ff.py/ec.py
remains the portable/reference path used by CPU tests).  Two problems it
solves, measured on v5e:

  * the jnp (..., 16) limb layout puts limbs in the lane dimension — 16/128
    lane occupancy and giant HLO graphs (hundreds of ops per field multiply,
    minutes of XLA compile for MSM-sized programs)
  * every field op round-trips HBM

Here a field element batch lives REGISTER-MAJOR inside the kernel: a block is
(16, 8, 128) uint32 — limb index in the leading (grid-less) axis, and each
limb row exactly one VPU register (8 sublanes x 128 lanes).  A whole EC point
addition (~25 Montgomery multiplies) is ONE pallas_call: inputs stream
HBM->VMEM once, all temporaries stay on-chip, and the XLA graph shrinks to a
single custom call per operation.

Montgomery multiply inside the kernel is the same full-word algorithm as
ff.FF.mul (hi/lo split 16x16 products, mu = -p^-1 mod R) but with plain
sequential carry chains — cheap as in-register vector ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import CurveSpec, FieldSpec, LIMB_BITS, LIMB_MASK, N_LIMBS
from ..limbs import int_to_limbs

MASK = np.uint32(LIMB_MASK)
BLOCK = 1024  # elements per block: (8, 128) lanes per limb row


def _limbs_const(x: int):
    return tuple(int(v) for v in int_to_limbs(x))


class FieldConsts:
    """Static per-field constants baked into kernels."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.p = _limbs_const(spec.p)
        mu = (-pow(spec.p, -1, 1 << 256)) % (1 << 256)
        self.mu = _limbs_const(mu)
        self.one = _limbs_const(spec.r_mod_p)  # 1 in Montgomery form


@functools.lru_cache(maxsize=None)
def field_consts(spec: FieldSpec) -> FieldConsts:
    return FieldConsts(spec)


# ---------------------------------------------------------------------------
# in-kernel limb math: values are lists of 16 (8, 128) uint32 rows
# ---------------------------------------------------------------------------

def _rows(ref_block):
    """(16, 8, 128) block -> list of 16 (8, 128) rows."""
    return [ref_block[i] for i in range(N_LIMBS)]


def _stackrows(rows):
    return jnp.stack(rows, axis=0)


def _mul_cols(a, b):
    """Schoolbook column sums of a*b (hi/lo split; 256 lane multiplies)."""
    zero = jnp.zeros_like(a[0])
    n = N_LIMBS
    t = [zero] * (2 * n + 1)
    for i in range(n):
        ai = a[i]
        for j in range(n):
            pr = ai * b[j]
            t[i + j] = t[i + j] + (pr & MASK)
            t[i + j + 1] = t[i + j + 1] + (pr >> LIMB_BITS)
    return t


def _sqr_cols(a):
    """Symmetric schoolbook column sums of a*a: cross products computed once
    and doubled — 136 lane multiplies instead of 256.  Column bound: cross
    sums < 2^20, doubled < 2^21, plus diagonal < 2^17 — still < 2^22."""
    zero = jnp.zeros_like(a[0])
    n = N_LIMBS
    cross = [zero] * (2 * n + 1)
    for i in range(n):
        ai = a[i]
        for j in range(i + 1, n):
            pr = ai * a[j]
            cross[i + j] = cross[i + j] + (pr & MASK)
            cross[i + j + 1] = cross[i + j + 1] + (pr >> LIMB_BITS)
    t = [c + c for c in cross]
    for i in range(n):
        pr = a[i] * a[i]
        t[2 * i] = t[2 * i] + (pr & MASK)
        t[2 * i + 1] = t[2 * i + 1] + (pr >> LIMB_BITS)
    return t


def k_mul(C: FieldConsts, a, b):
    """Montgomery product of two limb-row lists -> limb-row list."""
    return _mont_reduce(C, _mul_cols(a, b))


def _mont_reduce(C: FieldConsts, t):
    """Montgomery reduction of 512-bit column sums t (list of 2n+1 rows,
    columns < 2^22): returns (t * R^-1) mod p as n normalized limb rows."""
    zero = jnp.zeros_like(t[0])
    n = N_LIMBS
    # normalize low half -> exact 16-bit limbs + multi-bit carry into col 16
    tl = []
    carry = zero
    for k in range(n):
        v = t[k] + carry
        tl.append(v & MASK)
        carry = v >> LIMB_BITS
    t_lo_carry = carry
    # m = low16(T_lo * mu).  Static per-limb specialization: mu limbs that
    # are 0 are skipped, 1 becomes an add, 0xffff becomes (x << 16) - x
    # (one shift+sub instead of a 32-bit multiply).
    mcols = [zero] * n
    for i in range(n):
        ti = tl[i]
        for j in range(n - i):
            muj = C.mu[j]
            if muj == 0:
                continue
            if muj == 1:
                pr = ti
            elif muj == 0xFFFF:
                pr = (ti << np.uint32(LIMB_BITS)) - ti
            else:
                pr = ti * np.uint32(muj)
            mcols[i + j] = mcols[i + j] + (pr & MASK)
            if i + j + 1 < n:
                mcols[i + j + 1] = mcols[i + j + 1] + (pr >> LIMB_BITS)
    m = []
    carry = zero
    for k in range(n):
        v = mcols[k] + carry
        m.append(v & MASK)
        carry = v >> LIMB_BITS
    # u = m * p (full).  The Pallas/Vesta base primes are SPARSE in 16-bit
    # limbs (8 of 16 are zero, limb 0 is 1): zero limbs contribute nothing,
    # limb values 1 need no multiply — this drops the u-product from 256 lane
    # multiplies to ~112 for the primary curve cycle, for free, because the
    # prime is a static kernel constant.
    u = [zero] * (2 * n + 1)
    for i in range(n):
        mi = m[i]
        for j in range(n):
            pj = C.p[j]
            if pj == 0:
                continue
            if pj == 1:
                pr = mi
            elif pj == 0xFFFF:
                pr = (mi << np.uint32(LIMB_BITS)) - mi
            else:
                pr = mi * np.uint32(pj)
            u[i + j] = u[i + j] + (pr & MASK)
            u[i + j + 1] = u[i + j + 1] + (pr >> LIMB_BITS)
    # carry out of the (cancelling) low halves
    carry = zero
    for k in range(n):
        v = tl[k] + u[k] + carry
        carry = v >> LIMB_BITS
    # high half
    cols = [t[n + k] + u[n + k] for k in range(n + 1)]
    cols[0] = cols[0] + carry + t_lo_carry
    out = []
    carry = zero
    for k in range(n):
        v = cols[k] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    # cols[n] + carry is provably zero (result < 2p < 2^256)
    return k_cond_sub_p(C, out)


def k_cond_sub_p(C: FieldConsts, a):
    """a < 2p -> a mod p."""
    zero = jnp.zeros_like(a[0])
    borrow = zero
    d = []
    for k in range(N_LIMBS):
        v = a[k] + np.uint32(1 << LIMB_BITS) - np.uint32(C.p[k]) - borrow
        d.append(v & MASK)
        borrow = np.uint32(1) - (v >> LIMB_BITS)
    ge = borrow == 0
    return [jnp.where(ge, d[k], a[k]) for k in range(N_LIMBS)]


def k_add(C: FieldConsts, a, b):
    zero = jnp.zeros_like(a[0])
    carry = zero
    s = []
    for k in range(N_LIMBS):
        v = a[k] + b[k] + carry
        s.append(v & MASK)
        carry = v >> LIMB_BITS
    return k_cond_sub_p(C, s)


def k_sub(C: FieldConsts, a, b):
    zero = jnp.zeros_like(a[0])
    borrow = zero
    d = []
    for k in range(N_LIMBS):
        v = a[k] + np.uint32(1 << LIMB_BITS) - b[k] - borrow
        d.append(v & MASK)
        borrow = np.uint32(1) - (v >> LIMB_BITS)
    und = borrow == 1
    # add p back on underflow
    carry = zero
    dp = []
    for k in range(N_LIMBS):
        v = d[k] + np.uint32(C.p[k]) + carry
        dp.append(v & MASK)
        carry = v >> LIMB_BITS
    return [jnp.where(und, dp[k], d[k]) for k in range(N_LIMBS)]


def k_double(C, a):
    return k_add(C, a, a)


def k_sqr(C, a):
    """Montgomery square — symmetric product columns (18% fewer lane
    multiplies than k_mul; identical results)."""
    return _mont_reduce(C, _sqr_cols(a))


def k_neg(C, a):
    zero = [jnp.zeros_like(a[0])] * N_LIMBS
    return k_sub(C, zero, a)


def k_is_zero(a):
    acc = a[0]
    for k in range(1, N_LIMBS):
        acc = acc | a[k]
    return acc == 0


def k_select(mask, a, b):
    return [jnp.where(mask, x, y) for x, y in zip(a, b)]


def k_const(C: FieldConsts, x_mont_limbs, like):
    return [jnp.full_like(like, np.uint32(v)) for v in x_mont_limbs]


# ---------------------------------------------------------------------------
# EC formulas in kernel form (mirrors ops/ec.py exactly)
# ---------------------------------------------------------------------------

def k_ec_double(C: FieldConsts, curve: CurveSpec, X, Y, Z):
    A = k_sqr(C, X)
    B = k_sqr(C, Y)
    Cc = k_sqr(C, B)
    t = k_sqr(C, k_add(C, X, B))
    D = k_double(C, k_sub(C, k_sub(C, t, A), Cc))
    E3 = k_add(C, k_double(C, A), A)
    if curve.a != 0:
        z4 = k_sqr(C, k_sqr(C, Z))
        a_const = k_const(C, _limbs_const((curve.a * (1 << 256)) % curve.field.p), X[0])
        E3 = k_add(C, E3, k_mul(C, a_const, z4))
    F = k_sqr(C, E3)
    x3 = k_sub(C, F, k_double(C, D))
    y3 = k_sub(C, k_mul(C, E3, k_sub(C, D, x3)),
               k_double(C, k_double(C, k_double(C, Cc))))
    z3 = k_double(C, k_mul(C, Y, Z))
    return x3, y3, z3


def k_ec_add_mixed(C: FieldConsts, curve: CurveSpec, X1, Y1, Z1, QX, QY, QM):
    """Jacobian + affine (Z2 = 1) addition — madd-2007-bl shape, ~35% fewer
    field muls than the full add.  QM: identity mask rows for the affine
    operand (nonzero limb 0 <=> identity).  Mirrors EC.add_mixed exactly."""
    z1z1 = k_sqr(C, Z1)
    u2 = k_mul(C, QX, z1z1)
    s2 = k_mul(C, QY, k_mul(C, Z1, z1z1))
    h = k_sub(C, u2, X1)
    r = k_sub(C, s2, Y1)
    hh = k_sqr(C, h)
    hhh = k_mul(C, h, hh)
    v = k_mul(C, X1, hh)
    x3 = k_sub(C, k_sub(C, k_sqr(C, r), hhh), k_double(C, v))
    y3 = k_sub(C, k_mul(C, r, k_sub(C, v, x3)), k_mul(C, Y1, hhh))
    z3 = k_mul(C, Z1, h)

    id1 = k_is_zero(Z1)
    id2 = QM[0] != 0
    h0 = k_is_zero(h)
    r0 = k_is_zero(r)
    dx, dy, dz = k_ec_double(C, curve, X1, Y1, Z1)

    one = k_const(C, C.one, X1[0])
    zero = [jnp.zeros_like(X1[0])] * N_LIMBS
    ox, oy, oz = x3, y3, z3
    both0 = h0 & r0
    ox = k_select(both0, dx, ox)
    oy = k_select(both0, dy, oy)
    oz = k_select(both0, dz, oz)
    inv0 = h0 & ~r0
    ox = k_select(inv0, one, ox)
    oy = k_select(inv0, one, oy)
    oz = k_select(inv0, zero, oz)
    ox = k_select(id2 & ~id1, X1, ox)
    oy = k_select(id2 & ~id1, Y1, oy)
    oz = k_select(id2 & ~id1, Z1, oz)
    ox = k_select(id1 & ~id2, QX, ox)
    oy = k_select(id1 & ~id2, QY, oy)
    oz = k_select(id1 & ~id2, one, oz)
    both_id = id1 & id2
    ox = k_select(both_id, one, ox)
    oy = k_select(both_id, one, oy)
    oz = k_select(both_id, zero, oz)
    return ox, oy, oz


def k_ec_madd_fast(C: FieldConsts, X1, Y1, Z1, QX, QY):
    """Generic Jacobian + affine add with NO doubling / identity-carry paths:
    3 sqr + 8 mul (vs ~21 modmuls for the complete k_ec_add_mixed, which
    computes an unconditional double).  Returns (x3, y3, z3, exc) where `exc`
    (one (8,128) u32 0/1 row) flags slots whose exact result would need an
    exceptional path — identity carry or carry == +-Q — for the caller to
    recompute via the safe kernel.  The affine identity is encoded as QY == 0
    (to_affine's convention; valid because the supported curves have prime
    order, so no point has y = 0) — identity slots pass the carry through
    exactly and are not flagged, with no separate mask array to stream.
    Used by the MSM offset-point prefix scan (ops/msm.py), where the carry is
    blinded so exceptions can only occur for adversarial inputs."""
    z1z1 = k_sqr(C, Z1)
    u2 = k_mul(C, QX, z1z1)
    s2 = k_mul(C, QY, k_mul(C, Z1, z1z1))
    h = k_sub(C, u2, X1)
    r = k_sub(C, s2, Y1)
    hh = k_sqr(C, h)
    hhh = k_mul(C, h, hh)
    v = k_mul(C, X1, hh)
    x3 = k_sub(C, k_sub(C, k_sqr(C, r), hhh), k_double(C, v))
    y3 = k_sub(C, k_mul(C, r, k_sub(C, v, x3)), k_mul(C, Y1, hhh))
    z3 = k_mul(C, Z1, h)

    id1 = k_is_zero(Z1)
    id2 = k_is_zero(QY)
    exc = (~id2) & (id1 | k_is_zero(h))
    ox = k_select(id2, X1, x3)
    oy = k_select(id2, Y1, y3)
    oz = k_select(id2, Z1, z3)
    return ox, oy, oz, exc.astype(jnp.uint32)


def k_ec_madd_xyzz_fast(C: FieldConsts, X1, Y1, ZZ1, ZZZ1, QX, QY):
    """XYZZ + affine mixed add (madd-2008-s), NO exceptional paths: 8 mul +
    2 sqr — one square cheaper than the Jacobian k_ec_madd_fast because the
    carried ZZ/ZZZ make z1^2/z1^3 free.  Representation: x = X/ZZ, y = Y/ZZZ
    with ZZ^3 = ZZZ^2; identity encoded ZZ = 0.  Affine identity is QY == 0
    (passthrough, unflagged); exc flags identity carry / carry == +-Q rows
    for the caller's safe recompute — same contract as k_ec_madd_fast."""
    u2 = k_mul(C, QX, ZZ1)
    s2 = k_mul(C, QY, ZZZ1)
    pp_ = k_sub(C, u2, X1)
    r = k_sub(C, s2, Y1)
    ppsq = k_sqr(C, pp_)
    ppp = k_mul(C, pp_, ppsq)
    q = k_mul(C, X1, ppsq)
    x3 = k_sub(C, k_sub(C, k_sqr(C, r), ppp), k_double(C, q))
    y3 = k_sub(C, k_mul(C, r, k_sub(C, q, x3)), k_mul(C, Y1, ppp))
    zz3 = k_mul(C, ZZ1, ppsq)
    zzz3 = k_mul(C, ZZZ1, ppp)

    id1 = k_is_zero(ZZ1)
    id2 = k_is_zero(QY)
    exc = (~id2) & (id1 | k_is_zero(pp_))
    ox = k_select(id2, X1, x3)
    oy = k_select(id2, Y1, y3)
    ozz = k_select(id2, ZZ1, zz3)
    ozzz = k_select(id2, ZZZ1, zzz3)
    return ox, oy, ozz, ozzz, exc.astype(jnp.uint32)


def k_ec_add_fast(C: FieldConsts, X1, Y1, Z1, X2, Y2, Z2):
    """Generic Jacobian + Jacobian add with NO doubling path: ~11 mul + 4 sqr
    vs ~33 modmuls for the complete k_ec_add (which computes an unconditional
    double).  Identity OPERANDS pass through exactly (cheap selects).  The
    h == 0, r != 0 case (P + -P) yields z3 = 0 — a VALID identity encoding —
    so only the true doubling case (h == 0, r == 0, both non-identity) is
    flagged in `exc` for the caller to recompute via the safe kernel.  Used
    by the MSM bucket-query / triangle phases where operands are blinded
    prefix values (doubling collisions require adversarial alignment)."""
    z1z1 = k_sqr(C, Z1)
    z2z2 = k_sqr(C, Z2)
    u1 = k_mul(C, X1, z2z2)
    u2 = k_mul(C, X2, z1z1)
    s1 = k_mul(C, Y1, k_mul(C, Z2, z2z2))
    s2 = k_mul(C, Y2, k_mul(C, Z1, z1z1))
    h = k_sub(C, u2, u1)
    r = k_sub(C, s2, s1)
    hh = k_sqr(C, h)
    hhh = k_mul(C, h, hh)
    v = k_mul(C, u1, hh)
    x3 = k_sub(C, k_sub(C, k_sqr(C, r), hhh), k_double(C, v))
    y3 = k_sub(C, k_mul(C, r, k_sub(C, v, x3)), k_mul(C, s1, hhh))
    z3 = k_mul(C, k_mul(C, Z1, Z2), h)

    id1 = k_is_zero(Z1)
    id2 = k_is_zero(Z2)
    exc = (~id1) & (~id2) & k_is_zero(h) & k_is_zero(r)
    ox = k_select(id2, X1, k_select(id1, X2, x3))
    oy = k_select(id2, Y1, k_select(id1, Y2, y3))
    oz = k_select(id2, Z1, k_select(id1, Z2, z3))
    return ox, oy, oz, exc.astype(jnp.uint32)


def k_ec_add(C: FieldConsts, curve: CurveSpec, X1, Y1, Z1, X2, Y2, Z2):
    """Branchless complete Jacobian add (same mask dispatch as EC.add)."""
    z1z1 = k_sqr(C, Z1)
    z2z2 = k_sqr(C, Z2)
    u1 = k_mul(C, X1, z2z2)
    u2 = k_mul(C, X2, z1z1)
    s1 = k_mul(C, Y1, k_mul(C, Z2, z2z2))
    s2 = k_mul(C, Y2, k_mul(C, Z1, z1z1))
    h = k_sub(C, u2, u1)
    r = k_sub(C, s2, s1)
    hh = k_sqr(C, h)
    hhh = k_mul(C, h, hh)
    v = k_mul(C, u1, hh)
    x3 = k_sub(C, k_sub(C, k_sqr(C, r), hhh), k_double(C, v))
    y3 = k_sub(C, k_mul(C, r, k_sub(C, v, x3)), k_mul(C, s1, hhh))
    z3 = k_mul(C, k_mul(C, Z1, Z2), h)

    id1 = k_is_zero(Z1)
    id2 = k_is_zero(Z2)
    h0 = k_is_zero(h)
    r0 = k_is_zero(r)
    dx, dy, dz = k_ec_double(C, curve, X1, Y1, Z1)

    ox, oy, oz = x3, y3, z3
    both0 = h0 & r0
    ox = k_select(both0, dx, ox)
    oy = k_select(both0, dy, oy)
    oz = k_select(both0, dz, oz)
    inv0 = h0 & ~r0
    one = k_const(C, C.one, X1[0])
    zero = [jnp.zeros_like(X1[0])] * N_LIMBS
    ox = k_select(inv0, one, ox)
    oy = k_select(inv0, one, oy)
    oz = k_select(inv0, zero, oz)
    # identity operands
    ox = k_select(id2 & ~id1, X1, ox)
    oy = k_select(id2 & ~id1, Y1, oy)
    oz = k_select(id2 & ~id1, Z1, oz)
    ox = k_select(id1 & ~id2, X2, ox)
    oy = k_select(id1 & ~id2, Y2, oy)
    oz = k_select(id1 & ~id2, Z2, oz)
    both_id = id1 & id2
    ox = k_select(both_id, one, ox)
    oy = k_select(both_id, one, oy)
    oz = k_select(both_id, zero, oz)
    return ox, oy, oz


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _to_lm(x):
    """(B, 16) -> (16, nb, 8, 128) limb-major blocks (B padded to BLOCK)."""
    b = x.shape[0]
    pad = (-b) % BLOCK
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    nb = (b + pad) // BLOCK
    return x.T.reshape(N_LIMBS, nb, 8, 128)


def _from_lm(y, b):
    return y.reshape(N_LIMBS, -1).T[:b]


def _block_spec():
    return pl.BlockSpec(
        (N_LIMBS, 1, 8, 128),
        lambda i: (0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _flatten2(*arrs):
    """Broadcast leading dims and flatten to (B, 16)."""
    shape = jnp.broadcast_shapes(*(a.shape[:-1] for a in arrs))
    flat = tuple(
        jnp.broadcast_to(a, shape + (N_LIMBS,)).reshape(-1, N_LIMBS) for a in arrs
    )
    return shape, flat


@functools.partial(jax.jit, static_argnums=(0,))
def mont_mul(spec: FieldSpec, a, b):
    """(..., 16) x (..., 16) Montgomery product via one pallas kernel."""
    C = field_consts(spec)
    lead, (af, bf) = _flatten2(a, b)
    n = af.shape[0]
    al = _to_lm(af)
    bl = _to_lm(bf)
    nb = al.shape[1]

    def kern(a_ref, b_ref, o_ref):
        av = _rows(a_ref[:, 0])
        bv = _rows(b_ref[:, 0])
        o_ref[:, 0] = _stackrows(k_mul(C, av, bv))

    out = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct(al.shape, jnp.uint32),
        in_specs=[_block_spec()] * 2,
        out_specs=_block_spec(),
        interpret=_interpret(),
    )(al, bl)
    return _from_lm(out, n).reshape(lead + (N_LIMBS,))


@functools.partial(jax.jit, static_argnums=(0, 1))
def mont_addsub(spec: FieldSpec, is_sub: bool, a, b):
    """(..., 16) +/- (..., 16) mod p via one pallas kernel."""
    C = field_consts(spec)
    lead, (af, bf) = _flatten2(a, b)
    n = af.shape[0]
    al = _to_lm(af)
    bl = _to_lm(bf)
    nb = al.shape[1]

    def kern(a_ref, b_ref, o_ref):
        av = _rows(a_ref[:, 0])
        bv = _rows(b_ref[:, 0])
        out = k_sub(C, av, bv) if is_sub else k_add(C, av, bv)
        o_ref[:, 0] = _stackrows(out)

    out = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct(al.shape, jnp.uint32),
        in_specs=[_block_spec()] * 2,
        out_specs=_block_spec(),
        interpret=_interpret(),
    )(al, bl)
    return _from_lm(out, n).reshape(lead + (N_LIMBS,))


@functools.partial(jax.jit, static_argnums=(0,))
def ec_add(curve: CurveSpec, x1, y1, z1, x2, y2, z2):
    """Batched complete Jacobian addition as ONE pallas kernel.
    Inputs/outputs (..., 16) uint32 Montgomery limbs."""
    C = field_consts(curve.field)
    lead, flat = _flatten2(x1, y1, z1, x2, y2, z2)
    n = flat[0].shape[0]
    ins = [_to_lm(v) for v in flat]
    nb = ins[0].shape[1]

    def kern(x1r, y1r, z1r, x2r, y2r, z2r, xo, yo, zo):
        args = [_rows(r[:, 0]) for r in (x1r, y1r, z1r, x2r, y2r, z2r)]
        ox, oy, oz = k_ec_add(C, curve, *args)
        xo[:, 0] = _stackrows(ox)
        yo[:, 0] = _stackrows(oy)
        zo[:, 0] = _stackrows(oz)

    shape = jax.ShapeDtypeStruct(ins[0].shape, jnp.uint32)
    ox, oy, oz = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=(shape, shape, shape),
        in_specs=[_block_spec()] * 6,
        out_specs=(_block_spec(),) * 3,
        interpret=_interpret(),
    )(*ins)
    return tuple(
        _from_lm(o, n).reshape(lead + (N_LIMBS,)) for o in (ox, oy, oz)
    )


@functools.partial(jax.jit, static_argnums=(0,))
def ec_add_mixed(curve: CurveSpec, x1, y1, z1, qx, qy, qm):
    """Batched Jacobian + affine addition as ONE pallas kernel.
    qm: (..., 16) uint32 identity-mask rows (limb 0 nonzero <=> identity)."""
    C = field_consts(curve.field)
    lead, flat = _flatten2(x1, y1, z1, qx, qy, qm)
    n = flat[0].shape[0]
    ins = [_to_lm(v) for v in flat]
    nb = ins[0].shape[1]

    def kern(x1r, y1r, z1r, qxr, qyr, qmr, xo, yo, zo):
        args = [_rows(r[:, 0]) for r in (x1r, y1r, z1r, qxr, qyr, qmr)]
        ox, oy, oz = k_ec_add_mixed(C, curve, *args)
        xo[:, 0] = _stackrows(ox)
        yo[:, 0] = _stackrows(oy)
        zo[:, 0] = _stackrows(oz)

    shape = jax.ShapeDtypeStruct(ins[0].shape, jnp.uint32)
    ox, oy, oz = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=(shape, shape, shape),
        in_specs=[_block_spec()] * 6,
        out_specs=(_block_spec(),) * 3,
        interpret=_interpret(),
    )(*ins)
    return tuple(
        _from_lm(o, n).reshape(lead + (N_LIMBS,)) for o in (ox, oy, oz)
    )


@functools.partial(jax.jit, static_argnums=(0,))
def ec_add_fast(curve: CurveSpec, x1, y1, z1, x2, y2, z2):
    """Batched generic Jacobian + Jacobian addition (one pallas kernel), no
    doubling path: returns (x3, y3, z3, exc); see k_ec_add_fast."""
    C = field_consts(curve.field)
    lead, flat = _flatten2(x1, y1, z1, x2, y2, z2)
    n = flat[0].shape[0]
    ins = [_to_lm(v) for v in flat]
    nb = ins[0].shape[1]

    def kern(x1r, y1r, z1r, x2r, y2r, z2r, xo, yo, zo, eo):
        args = [_rows(r[:, 0]) for r in (x1r, y1r, z1r, x2r, y2r, z2r)]
        ox, oy, oz, exc = k_ec_add_fast(C, *args)
        xo[:, 0] = _stackrows(ox)
        yo[:, 0] = _stackrows(oy)
        zo[:, 0] = _stackrows(oz)
        eo[0] = exc

    shape = jax.ShapeDtypeStruct(ins[0].shape, jnp.uint32)
    eshape = jax.ShapeDtypeStruct((nb, 8, 128), jnp.uint32)
    espec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ox, oy, oz, exc = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=(shape, shape, shape, eshape),
        in_specs=[_block_spec()] * 6,
        out_specs=(_block_spec(), _block_spec(), _block_spec(), espec),
        interpret=_interpret(),
    )(*ins)
    outs = tuple(_from_lm(o, n).reshape(lead + (N_LIMBS,)) for o in (ox, oy, oz))
    exc_flat = exc.reshape(-1)[:n].reshape(lead)
    return outs + (exc_flat,)


@functools.partial(jax.jit, static_argnums=(0,))
def ec_add_mixed_fast(curve: CurveSpec, x1, y1, z1, qx, qy):
    """Batched generic Jacobian + affine addition (one pallas kernel), no
    exceptional paths: returns (x3, y3, z3, exc) with exc a (...,) uint32
    0/1 exception mask (see k_ec_madd_fast; affine identity = qy == 0)."""
    C = field_consts(curve.field)
    lead, flat = _flatten2(x1, y1, z1, qx, qy)
    n = flat[0].shape[0]
    ins = [_to_lm(v) for v in flat]
    nb = ins[0].shape[1]

    def kern(x1r, y1r, z1r, qxr, qyr, xo, yo, zo, eo):
        args = [_rows(r[:, 0]) for r in (x1r, y1r, z1r, qxr, qyr)]
        ox, oy, oz, exc = k_ec_madd_fast(C, *args)
        xo[:, 0] = _stackrows(ox)
        yo[:, 0] = _stackrows(oy)
        zo[:, 0] = _stackrows(oz)
        eo[0] = exc

    shape = jax.ShapeDtypeStruct(ins[0].shape, jnp.uint32)
    eshape = jax.ShapeDtypeStruct((nb, 8, 128), jnp.uint32)
    espec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ox, oy, oz, exc = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=(shape, shape, shape, eshape),
        in_specs=[_block_spec()] * 5,
        out_specs=(_block_spec(), _block_spec(), _block_spec(), espec),
        interpret=_interpret(),
    )(*ins)
    outs = tuple(_from_lm(o, n).reshape(lead + (N_LIMBS,)) for o in (ox, oy, oz))
    exc_flat = exc.reshape(-1)[:n].reshape(lead)
    return outs + (exc_flat,)


@functools.partial(jax.jit, static_argnums=(0,))
def ec_madd_xyzz_fast(curve: CurveSpec, x1, y1, zz1, zzz1, qx, qy):
    """Batched XYZZ + affine addition (one pallas kernel), no exceptional
    paths: returns (x3, y3, zz3, zzz3, exc); see k_ec_madd_xyzz_fast."""
    C = field_consts(curve.field)
    lead, flat = _flatten2(x1, y1, zz1, zzz1, qx, qy)
    n = flat[0].shape[0]
    ins = [_to_lm(v) for v in flat]
    nb = ins[0].shape[1]

    def kern(x1r, y1r, zz1r, zzz1r, qxr, qyr, xo, yo, zzo, zzzo, eo):
        args = [_rows(r[:, 0]) for r in (x1r, y1r, zz1r, zzz1r, qxr, qyr)]
        ox, oy, ozz, ozzz, exc = k_ec_madd_xyzz_fast(C, *args)
        xo[:, 0] = _stackrows(ox)
        yo[:, 0] = _stackrows(oy)
        zzo[:, 0] = _stackrows(ozz)
        zzzo[:, 0] = _stackrows(ozzz)
        eo[0] = exc

    shape = jax.ShapeDtypeStruct(ins[0].shape, jnp.uint32)
    eshape = jax.ShapeDtypeStruct((nb, 8, 128), jnp.uint32)
    espec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ox, oy, ozz, ozzz, exc = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=(shape, shape, shape, shape, eshape),
        in_specs=[_block_spec()] * 6,
        out_specs=(_block_spec(),) * 4 + (espec,),
        interpret=_interpret(),
    )(*ins)
    outs = tuple(_from_lm(o, n).reshape(lead + (N_LIMBS,))
                 for o in (ox, oy, ozz, ozzz))
    exc_flat = exc.reshape(-1)[:n].reshape(lead)
    return outs + (exc_flat,)


SCAN_W = 64      # sequential madd steps per lane in the fused scan
SCAN_SUB = 16    # steps per grid substep (VMEM working-set bound)
SCAN_LANES = 1024  # lanes per grid block


@functools.partial(jax.jit, static_argnums=(0, 1))
def fused_madd_scan_xyzz(curve: CurveSpec, t_limbs, pay_wcg):
    """The MSM's ENTIRE blinded prefix scan as ONE pallas kernel.

    pay_wcg: (SCAN_W, 16, g) uint32 — packed payload rows (x limbs 0..7 two
    per word, y limbs 8..15) transposed so that step t of every lane is the
    leading index; element i of the original order maps to
    (t = i % W, lane = i // W).  t_limbs: ((x limbs...), (y limbs...)) host
    Montgomery limb tuples of the blinding point T (static).

    Each grid block owns 1024 lanes; its XYZZ carry lives in VMEM scratch
    across W/SUB substeps, so the 64-step scan costs ONE kernel launch and
    zero carry HBM round-trips (the lax.scan formulation paid a pallas
    dispatch + 3x16384x64B carry round-trip per step — launch/traffic bound
    at ~145 us/step, ~40% above pure compute).  Unpacking the two 16-bit
    limbs per word happens in-register.

    Returns (inner 4x(W,16,g) XYZZ uint32, totals 4x(16,g), exc (nb,8,128)):
    inner[i] = T + inclusive_prefix within lane, totals = final lane carries
    (still blinded), exc per-lane exception flags (k_ec_madd_xyzz_fast's
    contract: identity carry / carry == +-Q; affine identity passes)."""
    C = field_consts(curve.field)
    w, _, g = pay_wcg.shape
    assert w == SCAN_W and g % SCAN_LANES == 0
    nb = g // SCAN_LANES
    nsub = SCAN_W // SCAN_SUB
    tx, ty = t_limbs

    def kern(pay_ref, ix_ref, iy_ref, izz_ref, izzz_ref,
             tx_ref, ty_ref, tzz_ref, tzzz_ref, exc_ref, carry, excs):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            for j in range(N_LIMBS):
                carry[0, j] = jnp.full((8, 128), np.uint32(tx[j]), jnp.uint32)
                carry[1, j] = jnp.full((8, 128), np.uint32(ty[j]), jnp.uint32)
                carry[2, j] = jnp.full((8, 128), np.uint32(C.one[j]), jnp.uint32)
                carry[3, j] = jnp.full((8, 128), np.uint32(C.one[j]), jnp.uint32)
            excs[0] = jnp.zeros((8, 128), jnp.uint32)

        for t in range(SCAN_SUB):
            pk = pay_ref[t].reshape(16, 8, 128)  # packed cols
            qx = [((pk[j // 2] >> np.uint32(16 * (j % 2))) & MASK)
                  for j in range(N_LIMBS)]
            qy = [((pk[8 + j // 2] >> np.uint32(16 * (j % 2))) & MASK)
                  for j in range(N_LIMBS)]
            x = [carry[0, j] for j in range(N_LIMBS)]
            y = [carry[1, j] for j in range(N_LIMBS)]
            zz = [carry[2, j] for j in range(N_LIMBS)]
            zzz = [carry[3, j] for j in range(N_LIMBS)]
            nx, ny, nzz, nzzz, e = k_ec_madd_xyzz_fast(C, x, y, zz, zzz, qx, qy)
            ix_ref[t] = _stackrows(nx).reshape(16, SCAN_LANES)
            iy_ref[t] = _stackrows(ny).reshape(16, SCAN_LANES)
            izz_ref[t] = _stackrows(nzz).reshape(16, SCAN_LANES)
            izzz_ref[t] = _stackrows(nzzz).reshape(16, SCAN_LANES)
            for j in range(N_LIMBS):
                carry[0, j] = nx[j]
                carry[1, j] = ny[j]
                carry[2, j] = nzz[j]
                carry[3, j] = nzzz[j]
            excs[0] = excs[0] | e

        tx_ref[:, :] = carry[0].reshape(16, SCAN_LANES)
        ty_ref[:, :] = carry[1].reshape(16, SCAN_LANES)
        tzz_ref[:, :] = carry[2].reshape(16, SCAN_LANES)
        tzzz_ref[:, :] = carry[3].reshape(16, SCAN_LANES)
        exc_ref[0] = excs[0]

    inner_shape = jax.ShapeDtypeStruct((w, 16, g), jnp.uint32)
    tot_shape = jax.ShapeDtypeStruct((16, g), jnp.uint32)
    inner_spec = pl.BlockSpec((SCAN_SUB, 16, SCAN_LANES),
                              lambda b, s: (s, 0, b), memory_space=pltpu.VMEM)
    tot_spec = pl.BlockSpec((16, SCAN_LANES), lambda b, s: (0, b),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(nb, nsub),
        out_shape=(inner_shape,) * 4 + (tot_shape,) * 4
        + (jax.ShapeDtypeStruct((nb, 8, 128), jnp.uint32),),
        in_specs=[inner_spec],
        out_specs=(inner_spec,) * 4 + (tot_spec,) * 4
        + (pl.BlockSpec((1, 8, 128), lambda b, s: (b, 0, 0),
                        memory_space=pltpu.VMEM),),
        scratch_shapes=[
            pltpu.VMEM((4, N_LIMBS, 8, 128), jnp.uint32),
            pltpu.VMEM((1, 8, 128), jnp.uint32),
        ],
        interpret=_interpret(),
    )(pay_wcg)


@functools.partial(jax.jit, static_argnums=(0,))
def ec_double(curve: CurveSpec, x1, y1, z1):
    C = field_consts(curve.field)
    lead, flat = _flatten2(x1, y1, z1)
    n = flat[0].shape[0]
    ins = [_to_lm(v) for v in flat]
    nb = ins[0].shape[1]

    def kern(x1r, y1r, z1r, xo, yo, zo):
        args = [_rows(r[:, 0]) for r in (x1r, y1r, z1r)]
        ox, oy, oz = k_ec_double(C, curve, *args)
        xo[:, 0] = _stackrows(ox)
        yo[:, 0] = _stackrows(oy)
        zo[:, 0] = _stackrows(oz)

    shape = jax.ShapeDtypeStruct(ins[0].shape, jnp.uint32)
    ox, oy, oz = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=(shape, shape, shape),
        in_specs=[_block_spec()] * 3,
        out_specs=(_block_spec(),) * 3,
        interpret=_interpret(),
    )(*ins)
    return tuple(
        _from_lm(o, n).reshape(lead + (N_LIMBS,)) for o in (ox, oy, oz)
    )
