"""Batched Jacobian-coordinate elliptic curve ops on TPU.

TPU-native equivalent of the halo2curves `CurveExt` group law the reference
leans on (SURVEY.md L0; jacobian_coordinates usage at
/root/reference/src/regular_functions_utils.rs:229,337).  Differences by
design:

  * points are structure-of-arrays (X, Y, Z) limb tensors, batched over
    leading axes — not objects
  * the group law is branchless-complete: the doubling / identity / inverse
    cases are computed in parallel and mask-selected, because data-dependent
    branches don't exist under jit
  * identity is encoded as Z == 0 (matching halo2curves' Jacobian convention)

All curves used here (Pallas, Vesta, Grumpkin) have a = 0; the doubling
formula exploits that statically when possible.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import CurveSpec, N_LIMBS
from ..limbs import int_to_mont_limbs, ints_to_mont_limbs, mont_limbs_to_ints
from .ff import FF, ff


class JPoint(NamedTuple):
    """Jacobian point: affine = (x/z^2, y/z^3); identity iff z == 0."""
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


_OFFSET_CACHE: dict = {}

# Canonical block width for fixed-shape reductions: EC-add kernel bodies
# re-trace per distinct batch shape, so every grouped sum/scan funnels
# through this one width (SUM_G also matches _pick_block_width's block
# count for the blocked prefix scans, sharing one trace across call sites).
SUM_G = 2048


def _bucket_lanes(b: int) -> int:
    """Canonical flattened-batch size for the pallas EC kernels: next power
    of two, at least one full 1024-lane block.  The unrolled Montgomery add
    body (~100k jaxpr equations) re-traces per distinct wrapper aval, so
    funneling every call through a few canonical sizes is worth the pad
    lanes (identity slots are exact no-ops for both add flavors)."""
    return max(1 << max(b - 1, 1).bit_length(), 1024)


def _pad_rows(arrs, b: int, bp: int):
    if bp == b:
        return arrs
    return tuple(jnp.pad(a, ((0, bp - b), (0, 0))) for a in arrs)


class EC:
    def __init__(self, curve: CurveSpec):
        self.curve = curve
        self.f: FF = ff(curve.field)
        self.a_is_zero = curve.a == 0
        self.a_const = self.f.const(curve.a)
        self.b_const = self.f.const(curve.b)

    # ------------------------------------------------------------- structure
    def identity(self, shape=()) -> JPoint:
        f = self.f
        one = jnp.broadcast_to(f.one, shape + (N_LIMBS,))
        zero = jnp.zeros(shape + (N_LIMBS,), dtype=jnp.uint32)
        return JPoint(one, one, zero)

    def generator(self, shape=()) -> JPoint:
        f = self.f
        gx = jnp.broadcast_to(f.const(self.curve.gen_x), shape + (N_LIMBS,))
        gy = jnp.broadcast_to(f.const(self.curve.gen_y), shape + (N_LIMBS,))
        one = jnp.broadcast_to(f.one, shape + (N_LIMBS,))
        return JPoint(gx, gy, one)

    def is_identity(self, p: JPoint):
        return self.f.is_zero(p.z)

    def select(self, mask, p: JPoint, q: JPoint) -> JPoint:
        s = self.f.select
        return JPoint(s(mask, p.x, q.x), s(mask, p.y, q.y), s(mask, p.z, q.z))

    def neg(self, p: JPoint) -> JPoint:
        return JPoint(p.x, self.f.neg(p.y), p.z)

    def eq(self, p: JPoint, q: JPoint):
        """Projective equality (identity-aware)."""
        f = self.f
        z1z1, z2z2 = f.sqr(p.z), f.sqr(q.z)
        x_eq = f.eq(f.mul(p.x, z2z2), f.mul(q.x, z1z1))
        y_eq = f.eq(f.mul(p.y, f.mul(q.z, z2z2)), f.mul(q.y, f.mul(p.z, z1z1)))
        id1, id2 = self.is_identity(p), self.is_identity(q)
        return jnp.where(id1 | id2, id1 == id2, x_eq & y_eq)

    # ------------------------------------------------------------- group law
    def double(self, p: JPoint) -> JPoint:
        """dbl-2009-l (a = 0) / generic M = 3X^2 + aZ^4.  Identity-safe:
        Z3 = 2YZ = 0 when Z = 0.  One Pallas kernel on TPU."""
        from .ff import _route_pallas

        if _route_pallas(p.x):
            from . import pallas_ff
            ox, oy, oz = pallas_ff.ec_double(self.curve, p.x, p.y, p.z)
            return JPoint(ox, oy, oz)
        f = self.f
        A = f.sqr(p.x)
        B = f.sqr(p.y)
        C = f.sqr(B)
        t = f.sqr(f.add(p.x, B))
        D = f.double(f.sub(f.sub(t, A), C))
        E = f.add(f.double(A), A)
        if not self.a_is_zero:
            z4 = f.sqr(f.sqr(p.z))
            E = f.add(E, f.mul(self.a_const, z4))
        F = f.sqr(E)
        x3 = f.sub(F, f.double(D))
        y3 = f.sub(f.mul(E, f.sub(D, x3)), f.double(f.double(f.double(C))))
        z3 = f.double(f.mul(p.y, p.z))
        return JPoint(x3, y3, z3)

    def add(self, p: JPoint, q: JPoint) -> JPoint:
        """Branchless complete addition (add-2007-bl + mask dispatch).
        On TPU the whole formula runs as one Pallas kernel."""
        from .ff import _route_pallas

        if _route_pallas(p.x, q.x):
            from . import pallas_ff
            # canonicalize the flattened batch (identity pad rows are exact
            # no-ops for the complete add) so wrapper avals — and therefore
            # kernel-body traces — collapse to a few shared sizes
            lead = jnp.broadcast_shapes(p.x.shape[:-1], p.y.shape[:-1],
                                        p.z.shape[:-1], q.x.shape[:-1],
                                        q.y.shape[:-1], q.z.shape[:-1])
            flat = tuple(
                jnp.broadcast_to(a, lead + (N_LIMBS,)).reshape(-1, N_LIMBS)
                for a in (p.x, p.y, p.z, q.x, q.y, q.z)
            )
            b = flat[0].shape[0]
            flat = _pad_rows(flat, b, _bucket_lanes(b))
            ox, oy, oz = pallas_ff.ec_add(self.curve, *flat)
            return JPoint(*(o[:b].reshape(lead + (N_LIMBS,))
                            for o in (ox, oy, oz)))
        f = self.f
        z1z1, z2z2 = f.sqr(p.z), f.sqr(q.z)
        u1 = f.mul(p.x, z2z2)
        u2 = f.mul(q.x, z1z1)
        s1 = f.mul(p.y, f.mul(q.z, z2z2))
        s2 = f.mul(q.y, f.mul(p.z, z1z1))
        h = f.sub(u2, u1)
        r = f.sub(s2, s1)
        hh = f.sqr(h)
        hhh = f.mul(h, hh)
        v = f.mul(u1, hh)
        x3 = f.sub(f.sub(f.sqr(r), hhh), f.double(v))
        y3 = f.sub(f.mul(r, f.sub(v, x3)), f.mul(s1, hhh))
        z3 = f.mul(f.mul(p.z, q.z), h)
        gen = JPoint(x3, y3, z3)

        id1, id2 = self.is_identity(p), self.is_identity(q)
        h0 = f.is_zero(h)
        r0 = f.is_zero(r)
        dbl = self.double(p)

        out = gen
        # same x: either double (same y) or identity (opposite y)
        out = self.select(h0 & r0, dbl, out)
        ident = self.identity(jnp.broadcast_shapes(p.z.shape[:-1], q.z.shape[:-1]))
        out = self.select(h0 & ~r0, ident, out)
        # identity operands (masks override the h0 cases above)
        out = self.select(id2 & ~id1, p, out)
        out = self.select(id1 & ~id2, q, out)
        out = self.select(id1 & id2, ident, out)
        return out

    def add_mixed(self, p: JPoint, qx, qy, q_is_identity):
        """p + affine(qx, qy) — cheaper than full add (madd-2007-bl).

        q_is_identity: (...,) bool mask for affine identity slots."""
        from .ff import _route_pallas

        if _route_pallas(p.x, qx):
            from . import pallas_ff
            qm = jnp.broadcast_to(
                q_is_identity.astype(jnp.uint32)[..., None],
                jnp.broadcast_shapes(qx.shape[:-1], q_is_identity.shape)
                + (N_LIMBS,),
            )
            ox, oy, oz = pallas_ff.ec_add_mixed(
                self.curve, p.x, p.y, p.z, qx, qy, qm
            )
            return JPoint(ox, oy, oz)
        f = self.f
        z1z1 = f.sqr(p.z)
        u2 = f.mul(qx, z1z1)
        s2 = f.mul(qy, f.mul(p.z, z1z1))
        h = f.sub(u2, p.x)
        r = f.sub(s2, p.y)
        hh = f.sqr(h)
        hhh = f.mul(h, hh)
        v = f.mul(p.x, hh)
        x3 = f.sub(f.sub(f.sqr(r), hhh), f.double(v))
        y3 = f.sub(f.mul(r, f.sub(v, x3)), f.mul(p.y, hhh))
        z3 = f.mul(p.z, h)
        gen = JPoint(x3, y3, z3)

        id1 = self.is_identity(p)
        id2 = q_is_identity
        h0 = f.is_zero(h)
        r0 = f.is_zero(r)
        dbl = self.double(p)
        q_jac = JPoint(qx, qy, jnp.broadcast_to(f.one, qx.shape))

        out = gen
        out = self.select(h0 & r0, dbl, out)
        ident = self.identity(p.z.shape[:-1])
        out = self.select(h0 & ~r0, ident, out)
        out = self.select(id2 & ~id1, p, out)
        out = self.select(id1 & ~id2, q_jac, out)
        out = self.select(id1 & id2, ident, out)
        return out

    def add_fast(self, p: JPoint, q: JPoint):
        """Generic Jacobian add with NO doubling path: returns (JPoint, exc).
        Identity operands pass through exactly; P + (-P) yields a valid z = 0
        identity; only a true doubling collision (p == q, both non-identity)
        is flagged for safe recomputation.  ~15 modmuls vs ~33 for `add`."""
        from .ff import _route_pallas

        if _route_pallas(p.x, q.x):
            from . import pallas_ff
            # canonical flattened batch; zero pad rows are double-identity
            # slots, which pass through unflagged (id1 & id2 -> no exc)
            lead = jnp.broadcast_shapes(p.x.shape[:-1], p.y.shape[:-1],
                                        p.z.shape[:-1], q.x.shape[:-1],
                                        q.y.shape[:-1], q.z.shape[:-1])
            flat = tuple(
                jnp.broadcast_to(a, lead + (N_LIMBS,)).reshape(-1, N_LIMBS)
                for a in (p.x, p.y, p.z, q.x, q.y, q.z)
            )
            b = flat[0].shape[0]
            flat = _pad_rows(flat, b, _bucket_lanes(b))
            ox, oy, oz, exc = pallas_ff.ec_add_fast(self.curve, *flat)
            out = JPoint(*(o[:b].reshape(lead + (N_LIMBS,))
                           for o in (ox, oy, oz)))
            return out, (exc != 0)[:b].reshape(lead)
        f = self.f
        z1z1, z2z2 = f.sqr(p.z), f.sqr(q.z)
        u1 = f.mul(p.x, z2z2)
        u2 = f.mul(q.x, z1z1)
        s1 = f.mul(p.y, f.mul(q.z, z2z2))
        s2 = f.mul(q.y, f.mul(p.z, z1z1))
        h = f.sub(u2, u1)
        r = f.sub(s2, s1)
        hh = f.sqr(h)
        hhh = f.mul(h, hh)
        v = f.mul(u1, hh)
        x3 = f.sub(f.sub(f.sqr(r), hhh), f.double(v))
        y3 = f.sub(f.mul(r, f.sub(v, x3)), f.mul(s1, hhh))
        z3 = f.mul(f.mul(p.z, q.z), h)
        id1, id2 = self.is_identity(p), self.is_identity(q)
        exc = (~id1) & (~id2) & f.is_zero(h) & f.is_zero(r)
        out = JPoint(x3, y3, z3)
        out = self.select(id1, q, out)
        out = self.select(id2, p, out)
        return out, exc

    def add_mixed_fast(self, p: JPoint, qx, qy):
        """Generic mixed add with NO doubling / identity-carry handling:
        returns (JPoint, exc) where exc (bool (...,)) flags slots whose exact
        result needed an exceptional path (identity carry, or carry == +-Q) —
        the caller must recompute flagged work with `add_mixed`.  The affine
        identity is ENCODED AS qy == 0 (to_affine's output convention; no
        real point has y = 0 on these prime-order curves) — such slots pass
        the carry through exactly and are not flagged.  Dropping the separate
        mask array matters: a bit-packed bool gather was the single most
        expensive op in the MSM window loop.

        3 sqr + 8 mul vs ~21 modmuls for the complete add_mixed: this is the
        MSM hot-loop body under the offset-point blinding scheme (ops/msm.py),
        where exceptions cannot occur for non-adversarial inputs."""
        from .ff import _route_pallas

        if _route_pallas(p.x, qx):
            from . import pallas_ff
            ox, oy, oz, exc = pallas_ff.ec_add_mixed_fast(
                self.curve, p.x, p.y, p.z, qx, qy
            )
            return JPoint(ox, oy, oz), exc != 0
        f = self.f
        z1z1 = f.sqr(p.z)
        u2 = f.mul(qx, z1z1)
        s2 = f.mul(qy, f.mul(p.z, z1z1))
        h = f.sub(u2, p.x)
        r = f.sub(s2, p.y)
        hh = f.sqr(h)
        hhh = f.mul(h, hh)
        v = f.mul(p.x, hh)
        x3 = f.sub(f.sub(f.sqr(r), hhh), f.double(v))
        y3 = f.sub(f.mul(r, f.sub(v, x3)), f.mul(p.y, hhh))
        z3 = f.mul(p.z, h)
        id1 = self.is_identity(p)
        id2 = f.is_zero(qy)
        exc = (~id2) & (id1 | f.is_zero(h))
        out = self.select(id2, p, JPoint(x3, y3, z3))
        return out, exc

    # ------------------------------------------------------------- XYZZ form
    # x = X/ZZ, y = Y/ZZZ with ZZ^3 = ZZZ^2; identity encoded ZZ = ZZZ = 0.
    # Carried by the MSM's blinded prefix scan: the cached ZZ/ZZZ make the
    # z^2/z^3 of every mixed add free (8M + 2S vs Jacobian fast's 8M + 3S).

    def madd_xyzz_fast(self, x, y, zz, zzz, qx, qy):
        """XYZZ + affine fast add: returns (x3, y3, zz3, zzz3, exc) with the
        same exception contract as add_mixed_fast (affine identity = qy == 0
        passes through unflagged; identity carry / carry == +-Q flags)."""
        from .ff import _route_pallas

        if _route_pallas(x, qx):
            from . import pallas_ff
            ox, oy, ozz, ozzz, exc = pallas_ff.ec_madd_xyzz_fast(
                self.curve, x, y, zz, zzz, qx, qy
            )
            return ox, oy, ozz, ozzz, exc != 0
        f = self.f
        u2 = f.mul(qx, zz)
        s2 = f.mul(qy, zzz)
        pp_ = f.sub(u2, x)
        r = f.sub(s2, y)
        ppsq = f.sqr(pp_)
        ppp = f.mul(pp_, ppsq)
        q = f.mul(x, ppsq)
        x3 = f.sub(f.sub(f.sqr(r), ppp), f.double(q))
        y3 = f.sub(f.mul(r, f.sub(q, x3)), f.mul(y, ppp))
        zz3 = f.mul(zz, ppsq)
        zzz3 = f.mul(zzz, ppp)
        id1 = f.is_zero(zz)
        id2 = f.is_zero(qy)
        exc = (~id2) & (id1 | f.is_zero(pp_))
        sel = lambda a, b: f.select(id2, a, b)
        return sel(x, x3), sel(y, y3), sel(zz, zz3), sel(zzz, zzz3), exc

    def xyzz_offset(self, shape=()):
        """The blinding point T in XYZZ form (affine, so ZZ = ZZZ = 1)."""
        t = self.offset_point(shape)
        one = jnp.broadcast_to(self.f.one, shape + (N_LIMBS,))
        return t.x, t.y, one, one

    def xyzz_to_jacobian(self, x, y, zz, zzz) -> JPoint:
        """(X, Y, ZZ, ZZZ) -> Jacobian (X*ZZ^2, Y*ZZZ^2, ZZZ): exact for the
        identity too (all-zero maps to all-zero = Jacobian identity)."""
        f = self.f
        return JPoint(f.mul(x, f.sqr(zz)), f.mul(y, f.sqr(zzz)), zzz)

    def offset_point_ints(self, mult: int = 1):
        """Host (x, y) ints of [mult]T (same cache as offset_point)."""
        from ..utils import pyref

        key = (self.curve, "offset", mult)
        pt = _OFFSET_CACHE.get(key)
        if pt is None:
            self.offset_point((), mult)  # populates the cache
            pt = _OFFSET_CACHE[key]
        return pt

    def offset_point(self, shape=(), mult: int = 1) -> JPoint:
        """Fixed nothing-up-my-sleeve blinding point T = [0x0EA6E4...]*G used
        to seed MSM prefix-scan carries so the fast (exception-free) adds are
        exact for all non-adversarial inputs; computed host-side once.
        mult=k returns [k]T (used to cancel accumulated blinding, e.g. the
        (2^c - 1) copies a blinded bucket-suffix sum carries)."""
        from ..utils import pyref

        key = (self.curve, "offset", mult)
        pt = _OFFSET_CACHE.get(key)
        if pt is None:
            k = 0x0EA6E4B11DC0FFEE % self.curve.scalar_field.p
            base = _OFFSET_CACHE.get((self.curve, "offset", 1))
            if base is None:
                base = pyref.ec_mul(
                    (self.curve.gen_x, self.curve.gen_y), k, self.curve
                )
                _OFFSET_CACHE[(self.curve, "offset", 1)] = base
            pt = base if mult == 1 else pyref.ec_mul(base, mult, self.curve)
            _OFFSET_CACHE[key] = pt
        f = self.f
        x = jnp.broadcast_to(f.const(pt[0]), shape + (N_LIMBS,))
        y = jnp.broadcast_to(f.const(pt[1]), shape + (N_LIMBS,))
        one = jnp.broadcast_to(f.one, shape + (N_LIMBS,))
        return JPoint(x, y, one)

    # ----------------------------------------------------------- conversions
    def to_affine(self, p: JPoint):
        """Batched Jacobian -> affine via Montgomery-trick inversion.
        Identity maps to (0, 0) with its mask returned.
        Mirrors the zinv normalization at
        /root/reference/src/regular_functions_utils.rs:228-233."""
        f = self.f
        flat_z = p.z.reshape(-1, N_LIMBS)
        zinv = f.batch_inv(flat_z, axis=0).reshape(p.z.shape)
        zinv2 = f.sqr(zinv)
        x = f.mul(p.x, zinv2)
        y = f.mul(p.y, f.mul(zinv, zinv2))
        ident = self.is_identity(p)
        x = f.select(ident, jnp.zeros_like(x), x)
        y = f.select(ident, jnp.zeros_like(y), y)
        return x, y, ident

    def from_affine(self, x, y, is_ident=None) -> JPoint:
        f = self.f
        one = jnp.broadcast_to(f.one, x.shape)
        z = one
        if is_ident is not None:
            z = f.select(is_ident, jnp.zeros_like(z), z)
        return JPoint(x, y, z)

    def projective_coords(self, p: JPoint):
        """Jacobian -> homogeneous projective (X*Z, Y, Z^3): the coordinate
        change used by linefunc (/root/reference/src/regular_functions_utils.rs:426-431)."""
        f = self.f
        zsq = f.sqr(p.z)
        return f.mul(p.x, p.z), p.y, f.mul(p.z, zsq)

    # ------------------------------------------------------------ arithmetic
    def scalar_mul_small(self, p: JPoint, k: int) -> JPoint:
        """p * k for small static k (double-and-add; used for carry*base,
        /root/reference/src/argument_witness_calc.rs:118)."""
        assert k >= 0
        if k == 0:
            return self.identity(p.z.shape[:-1])
        acc = p
        for bit in bin(k)[3:]:
            acc = self.double(acc)
            if bit == "1":
                acc = self.add(acc, p)
        return acc

    def sum(self, p: JPoint, axis: int = 0) -> JPoint:
        """Reduce a batch of points along `axis`.

        Structured as rounds of `lax.scan` over G-row blocks (the add body
        compiles once per round) followed by a short unrolled tree — keeps
        both the compiled graph small and the sequential-step count ~O(G log n)
        instead of the reference's rayon chunk-fold
        (/root/reference/src/regular_functions_utils.rs:707-719)."""
        from .. import config as _cfg

        x, y, z = (jnp.moveaxis(c, axis, 0) for c in p)
        n = x.shape[0]
        batch = x.shape[1:-1]  # extra batch dims ride along
        if _cfg.use_pallas():
            # FIXED-SHAPE grouped reduction (docs/DESIGN-compile-time.md
            # prescription 1): every unrolled Montgomery add body re-traces
            # per DISTINCT batch shape (~30k jaxpr equations each), so the
            # old log-halving's log2(n) shrinking instantiations dominated
            # cold compile.  Instead: scan down to the canonical block
            # width SUM_G (shared with the blocked prefix scans), then
            # finish with a Hillis-Steele log scan whose adds all run at
            # THAT one shape.  (The former intermediate SUM_G2=64 scan
            # stage burned ~32 sequential launches at 64/1024-lane
            # occupancy — the direct log scan at SUM_G does ~11 launches
            # at full width for strictly less padded-lane work; ADVICE r4.)
            def _scan_to(x, y, z, n, g):
                w = -(-n // g)
                pad = g * w - n
                if pad:
                    idp = self.identity((pad,) + batch)
                    x = jnp.concatenate([x, idp.x], axis=0)
                    y = jnp.concatenate([y, idp.y], axis=0)
                    z = jnp.concatenate([z, idp.z], axis=0)
                cols = tuple(
                    c.reshape((g, w) + batch + (N_LIMBS,)).swapaxes(0, 1)
                    for c in (x, y, z)
                )

                def step(carry, col):
                    return self.add(carry, JPoint(*col)), None

                acc, _ = jax.lax.scan(step, self.identity((g,) + batch), cols)
                return acc.x, acc.y, acc.z

            if n > 2 * SUM_G:
                x, y, z = _scan_to(x, y, z, n, SUM_G)
                n = SUM_G
            # n <= 2*SUM_G (or was small to begin with): Hillis-Steele
            # inclusive scan at fixed width n; total lands in the last slot
            pt = JPoint(x, y, z)
            d = 1
            while d < n:
                idp = self.identity((d,) + batch)
                shifted = JPoint(
                    jnp.concatenate([idp.x, pt.x[:-d]], axis=0),
                    jnp.concatenate([idp.y, pt.y[:-d]], axis=0),
                    jnp.concatenate([idp.z, pt.z[:-d]], axis=0),
                )
                pt = self.add(pt, shifted)
                d *= 2
            return JPoint(pt.x[n - 1], pt.y[n - 1], pt.z[n - 1])
        while n > 1:
            # w = 1 on the last round: the scan itself finishes the reduction
            # (no unrolled tail tree — every unrolled add is a fresh ~45-modmul
            # instantiation, and XLA:CPU compile cost is linear in those)
            groups = min(64, n)
            w = -(-n // groups)
            pad = groups * w - n
            if pad:
                idp = self.identity((pad,) + batch)
                x = jnp.concatenate([x, idp.x], axis=0)
                y = jnp.concatenate([y, idp.y], axis=0)
                z = jnp.concatenate([z, idp.z], axis=0)
            rows = JPoint(
                x.reshape((groups, w) + batch + (N_LIMBS,)),
                y.reshape((groups, w) + batch + (N_LIMBS,)),
                z.reshape((groups, w) + batch + (N_LIMBS,)),
            )

            def step(carry, row):
                return self.add(carry, JPoint(*row)), None

            acc, _ = jax.lax.scan(step, self.identity((w,) + batch), tuple(rows))
            x, y, z = acc.x, acc.y, acc.z
            n = w
        return JPoint(x[0], y[0], z[0])

    # ------------------------------------------------------------ host utils
    def points_from_ints(self, coords) -> JPoint:
        """[(x, y) or None] (None = identity) -> batched JPoint (host-side)."""
        spec = self.curve.field
        xs = [c[0] if c else 0 for c in coords]
        ys = [c[1] if c else 0 for c in coords]
        idm = np.array([c is None for c in coords])
        x = jnp.asarray(ints_to_mont_limbs(xs, spec))
        y = jnp.asarray(ints_to_mont_limbs(ys, spec))
        return self.from_affine(x, y, jnp.asarray(idm))

    def points_to_ints(self, p: JPoint):
        """Batched JPoint -> [(x, y) or None].  Pure host math after the
        device fetch (no device inversion graphs — keeps utility paths free
        of expensive compiles)."""
        spec = self.curve.field
        pp = spec.p
        xs = mont_limbs_to_ints(np.asarray(p.x).reshape(-1, N_LIMBS), spec)
        ys = mont_limbs_to_ints(np.asarray(p.y).reshape(-1, N_LIMBS), spec)
        zs = mont_limbs_to_ints(np.asarray(p.z).reshape(-1, N_LIMBS), spec)
        out = []
        for x, y, z in zip(xs, ys, zs):
            if z == 0:
                out.append(None)
                continue
            zi = pow(z, pp - 2, pp)
            zi2 = zi * zi % pp
            out.append((x * zi2 % pp, y * zi2 * zi % pp))
        return out


@lru_cache(maxsize=None)
def ec(curve: CurveSpec) -> EC:
    return EC(curve)
