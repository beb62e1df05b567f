"""Batched prime-field arithmetic for TPU: 16x16-bit limbs, Montgomery form.

This is the L0 arithmetic backend that the reference imports from the halo2
fork / `ff` crate (SURVEY.md L0; /root/reference/src/regular_functions_utils.rs:1-12
uses 4x64-bit Montgomery fields).  A 64-bit limb design cannot run on the TPU
VPU, so the TPU-native layout is:

  * field element = (..., 16) uint32 array, little-endian 16-bit limbs
  * Montgomery domain with R = 2^256 throughout the compute path
  * 16x16 -> 32-bit limb products (exact in uint32), split into hi/lo halves so
    column accumulations stay < 2^22 and never overflow
  * all ops are batched over arbitrary leading axes and jit/vmap/shard_map-safe
    (pure functions of arrays, Python loops are static and unrolled)

Bit-exactness: canonical values (after from_mont) agree with the Rust
reference's field semantics; see tests/test_ff.py which checks against exact
Python ints and against the reference's frozen Montgomery byte tables.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FieldSpec, LIMB_BITS, LIMB_MASK, N_LIMBS
from ..limbs import int_to_limbs

MASK = np.uint32(LIMB_MASK)
U32 = jnp.uint32


def _route_pallas(*arrs) -> bool:
    """True when the Pallas TPU kernels should handle this op: enabled by
    config and the broadcast batch is large enough to amortize block padding."""
    from .. import config as _cfg

    if not _cfg.use_pallas():
        return False
    import math as _math

    shape = jnp.broadcast_shapes(*(a.shape[:-1] for a in arrs))
    return _math.prod(shape) >= _cfg.PALLAS_MIN_BATCH


def _stack(cols, axis=-1):
    return jnp.stack(cols, axis=axis)


class FF:
    """Field-arithmetic kernel namespace bound to one FieldSpec.

    Get instances via `ff(spec)` (cached).  All methods are pure and traceable.
    """

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        p = spec.p
        self.p_limbs = np.asarray(int_to_limbs(p), dtype=np.uint32)
        self.n0inv = np.uint32(spec.n0inv)
        # mu = -p^-1 mod 2^256, for full-word Montgomery reduction
        mu = (-pow(p, -1, 1 << 256)) % (1 << 256)
        self.mu_limbs = np.asarray(int_to_limbs(mu), dtype=np.uint32)
        # (2^256 * R) mod p: folds the 17th limb of lazy column sums back in
        # via one Montgomery multiply (see reduce_columns)
        self.c256 = np.asarray(int_to_limbs(((1 << 256) * spec.r_mod_p) % p), dtype=np.uint32)
        self.zero = np.zeros((N_LIMBS,), dtype=np.uint32)
        self.one = np.asarray(int_to_limbs(spec.r_mod_p), dtype=np.uint32)  # 1 in Mont form
        self.r2 = np.asarray(int_to_limbs(spec.r2_mod_p), dtype=np.uint32)
        self.one_raw = np.asarray(int_to_limbs(1), dtype=np.uint32)
        # p-2 bits msb-first, for Fermat inversion
        e = p - 2
        bits = [(e >> i) & 1 for i in range(e.bit_length())][::-1]
        self._inv_bits = np.asarray(bits, dtype=np.uint32)
        self._r_minus_p = np.asarray(int_to_limbs((1 << 256) - p), dtype=np.uint32)

    # ------------------------------------------------------------------ utils
    def const(self, x: int) -> jnp.ndarray:
        """Canonical int -> Montgomery limb constant (host-side conversion)."""
        from ..limbs import int_to_mont_limbs
        return np.asarray(int_to_mont_limbs(x, self.spec), dtype=np.uint32)

    @staticmethod
    def select(mask, x, y):
        """mask: (...,) bool; x,y: (..., N_LIMBS). Returns where(mask, x, y)."""
        return jnp.where(mask[..., None], x, y)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=-1)

    @staticmethod
    def eq(a, b):
        return jnp.all(a == b, axis=-1)

    # ------------------------------------------------------- carry primitives
    @staticmethod
    def _shift_up(v, d):
        """Shift columns toward higher limb index by d (zero fill)."""
        pad = [(0, 0)] * (v.ndim - 1) + [(d, 0)]
        return jnp.pad(v, pad)[..., : v.shape[-1]]

    @classmethod
    def _normalize(cls, cols):
        """Fully propagate carries: cols (..., K) uint32 column sums < 2^30
        -> (normalized 16-bit limbs (..., K), carry_out (...,)).

        Whole-array formulation (no per-limb slicing, keeps jaxpr small and
        VPU-wide): two folding rounds reduce every limb to <= 2^16, then a
        Kogge-Stone carry-lookahead scan resolves the remaining 0/1 ripple in
        log2(K) rounds.
        """
        k = cols.shape[-1]
        v = jnp.pad(cols, [(0, 0)] * (cols.ndim - 1) + [(0, 1)])  # room for carry
        for _ in range(2):
            v = (v & MASK) + cls._shift_up(v >> LIMB_BITS, 1)
        # now v <= 2^16; single-bit carries remain
        g = v >> LIMB_BITS          # generate (0/1)
        p = ((v & MASK) == MASK).astype(U32)  # propagate
        d = 1
        while d < k + 1:
            g = g | (p * cls._shift_up(g, d))
            p = p * cls._shift_up(p, d)
            d *= 2
        carry_in = cls._shift_up(g, 1)
        out = (v + carry_in) & MASK
        return out[..., :k], out[..., k]

    def _sub_borrow(self, a, b):
        """(a - b) mod 2^256; a, b (..., 16) normalized limbs.
        Returns (diff, borrow) with borrow in {0,1}."""
        cols = a + (MASK - b)
        one0 = jnp.pad(
            jnp.ones(cols.shape[:-1] + (1,), dtype=U32),
            [(0, 0)] * (cols.ndim - 1) + [(0, cols.shape[-1] - 1)],
        )
        d, carry = self._normalize(cols + one0)
        return d, U32(1) - carry

    def _norm_sub_p(self, cols):
        """Normalize columns (value < 2p, cols < 2^29) AND reduce mod p with a
        single carry network: the candidate and candidate-minus-p are stacked
        on a new axis and normalized together; the carry bit of the second
        lane decides which to keep.  One normalize where the naive pipeline
        (normalize + compare/subtract) needs two — this trick halves the
        field add/sub graphs, which dominate traced-op counts."""
        rp = jnp.asarray(self._r_minus_p)  # 2^256 - p as 16 limbs
        stacked = jnp.stack([cols, cols + rp], axis=-2)  # (..., 2, 16)
        norm, carry = self._normalize(stacked)
        take_sub = carry[..., 1] == 1  # value >= p
        return jnp.where(take_sub[..., None], norm[..., 1, :], norm[..., 0, :])

    # --------------------------------------------------------------- add/sub
    def add(self, a, b):
        """(a + b) mod p.  p < 2^255 so the sum is < 2p < 2^256."""
        if _route_pallas(a, b):
            from . import pallas_ff
            return pallas_ff.mont_addsub(self.spec, False, a, b)
        return self._norm_sub_p(a + b)

    def sub(self, a, b):
        """(a - b) mod p via one stacked normalize: lane0 = a - b + 2^256
        (carry <=> a >= b), lane1 = a - b + p + 2^256."""
        if _route_pallas(a, b):
            from . import pallas_ff
            return pallas_ff.mont_addsub(self.spec, True, a, b)
        base = a + (MASK - b)
        one0 = jnp.pad(
            jnp.ones(base.shape[:-1] + (1,), dtype=U32),
            [(0, 0)] * (base.ndim - 1) + [(0, N_LIMBS - 1)],
        )
        lane0 = base + one0
        lane1 = lane0 + jnp.asarray(self.p_limbs)
        norm, carry = self._normalize(jnp.stack([lane0, lane1], axis=-2))
        a_ge_b = carry[..., 0] == 1
        return jnp.where(a_ge_b[..., None], norm[..., 0, :], norm[..., 1, :])

    def neg(self, a):
        """-a mod p (maps 0 -> 0)."""
        return self.sub(jnp.zeros_like(a), a)

    def double(self, a):
        return self.add(a, a)

    # ---------------------------------------------------------------- mul
    @staticmethod
    def _prod_cols(a, b):
        """Column sums of the schoolbook product a*b.

        a, b: (..., 16) normalized 16-bit limbs.  Returns (..., 32) uint32
        columns c[k] = sum_{i+j=k} a_i*b_j  split-accumulated so every column
        stays < 2^21 + 2^21 < 2^22 (no overflow).

        The anti-diagonal sums use a pad/flatten/reshape trick instead of
        gathers: padding each row of the outer product to width 2n+1 and
        re-viewing as rows of width 2n aligns index (i, j) -> (i, i+j).
        Pure data-movement ops; no scatter/gather; fuses on TPU.
        """
        n = N_LIMBS
        outer = a[..., :, None] * b[..., None, :]  # (..., n, n) exact u32
        lo = outer & MASK
        hi = outer >> LIMB_BITS

        def diag_sums(m):
            # m: (..., n, n) -> (..., 2n) with out[k] = sum_{i+j=k} m[i, j]
            pad = jnp.pad(m, [(0, 0)] * (m.ndim - 1) + [(0, n + 1)])
            flat = pad.reshape(pad.shape[:-2] + (n * (2 * n + 1),))
            flat = flat[..., : 2 * n * n]
            return flat.reshape(flat.shape[:-1] + (n, 2 * n)).sum(-2, dtype=U32)

        c = diag_sums(lo)  # columns 0..2n-2
        ch = diag_sums(hi)  # contributes at k+1
        c = c + jnp.pad(ch, [(0, 0)] * (ch.ndim - 1) + [(1, 0)])[..., : 2 * n]
        return c  # (..., 2n); true product = sum c[k] 2^(16k)  (col 2n-1 < 2^22)

    def mul(self, a, b):
        """Montgomery product: a*b*R^-1 mod p  (R = 2^256).

        Full-word (non-interleaved) Montgomery: the quotient m is computed for
        the whole 256-bit low half at once, so the only sequential work is
        three short carry chains — everything else is wide parallel limb math.
        This is the TPU-shaped replacement for the CIOS loop a CPU
        implementation (reference L0 `ff` crate) would use:

          T = a*b                      (512-bit, column form)
          m = (T mod R) * mu mod R     (mu = -p^-1 mod R)
          res = (T + m*p) / R          (exact division)
          res -= p if res >= p

        Routes to the Pallas TPU kernel (same algorithm, register-major
        layout, single fused op) for large batches on TPU.
        """
        if _route_pallas(a, b):
            from . import pallas_ff
            return pallas_ff.mont_mul(self.spec, a, b)
        n = N_LIMBS
        t = self._prod_cols(a, b)  # (..., 2n) columns of a*b, < 2^22
        # normalize low half to get T mod R as 16-bit limbs
        t_lo, t_lo_carry = self._normalize(t[..., :n])
        # m = low16(T_lo * mu): only columns 0..15 of the product needed
        m_cols = self._prod_cols(t_lo, jnp.broadcast_to(self.mu_limbs, t_lo.shape))
        m, _ = self._normalize(m_cols[..., :n])
        # U = m * p (full product)
        u = self._prod_cols(m, jnp.broadcast_to(self.p_limbs, m.shape))
        # low halves cancel exactly: carry-out of (T_lo + U_lo) into column n
        # (multi-bit: u's low columns are unnormalized)
        _, lo_carry = self._normalize(t_lo + u[..., :n])
        # high half: T_hi + U_hi + carries; value < 2p, so one stacked
        # normalize-and-conditional-subtract finishes the reduction
        hi = t[..., n:] + u[..., n:]
        carry0 = jnp.pad(
            (lo_carry + t_lo_carry)[..., None],
            [(0, 0)] * (hi.ndim - 1) + [(0, n - 1)],
        )
        return self._norm_sub_p(hi + carry0)

    def sqr(self, a):
        return self.mul(a, a)

    def mul_small(self, a, k: int):
        """a * k for small static k >= 0 via double-and-add."""
        assert k >= 0
        if k == 0:
            return jnp.zeros_like(a)
        acc = a
        for bit in bin(k)[3:]:
            acc = self.double(acc)
            if bit == "1":
                acc = self.add(acc, a)
        return acc

    # --------------------------------------------------- lazy sums/reductions
    def reduce_columns(self, cols):
        """Reduce lazy uint32 column sums of Montgomery residues to a
        canonical element in [0, p).

        cols: (..., K) with K <= 17, columns < 2^30, total value < 2^271.
        This is the amortized-reduction primitive behind convolution
        anti-diagonal sums and wide dot products: sum limbs as integers,
        reduce ONCE instead of per-addition.
        """
        k = cols.shape[-1]
        assert k <= 17
        if k < 17:
            cols = jnp.pad(cols, [(0, 0)] * (cols.ndim - 1) + [(0, 17 - k)])
        limbs, _ = self._normalize(cols)
        lo = limbs[..., :16]
        top = limbs[..., 16]
        # lo mod p via one Montgomery multiply by (R mod p):
        # mont_mul(lo, R mod p) = lo * R * R^-1 = lo (mod p), fully reduced
        lo_red = self.mul(lo, jnp.broadcast_to(jnp.asarray(self.one), lo.shape))
        top_el = jnp.pad(top[..., None], [(0, 0)] * (top.ndim) + [(0, 15)])
        t1 = self.mul(top_el, jnp.broadcast_to(self.c256, top_el.shape))
        return self.add(lo_red, t1)

    def sum(self, a, axis: int = -2):
        """Sum field elements along `axis` with lazy uint32 accumulation in
        chunks of 4096 (columns stay < 2^28) + one reduction per chunk."""
        a = jnp.moveaxis(a, axis, -2)
        n = a.shape[-2]
        while n > 1:
            c = min(n, 4096)
            pad = (-n) % c
            if pad:
                a = jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, pad), (0, 0)])
            g = (n + pad) // c
            cols = a.reshape(a.shape[:-2] + (g, c, N_LIMBS)).sum(-2, dtype=U32)
            a = self.reduce_columns(cols)
            n = g
        return a[..., 0, :]

    def dot(self, a, b, axis: int = -2):
        """sum(mul(a, b)) along axis — Montgomery muls + lazy-reduced sum."""
        return self.sum(self.mul(a, b), axis=axis)

    # ------------------------------------------------------- mont conversions
    def to_mont(self, a_raw):
        """Canonical limbs -> Montgomery limbs (device-side)."""
        return self.mul(a_raw, self.r2)

    def from_mont(self, a):
        """Montgomery limbs -> canonical limbs (device-side)."""
        return self.mul(a, self.one_raw)

    # ---------------------------------------------------------------- pow/inv
    def pow_fixed(self, a, e: int):
        """a^e for a static exponent e >= 0 (unrolled square-and-multiply)."""
        if e == 0:
            return jnp.broadcast_to(self.one, a.shape)
        acc = a
        for bit in bin(e)[3:]:
            acc = self.sqr(acc)
            if bit == "1":
                acc = self.mul(acc, a)
        return acc

    def inv(self, a):
        """a^(p-2): Fermat inversion (inv(0) = 0). Uses fori_loop to keep the
        traced graph small; ~256 iterations of sqr + select-mul."""
        bits = jnp.asarray(self._inv_bits)  # device-side: fori_loop indexes it
        nbits = bits.shape[0]

        def body(i, acc):
            acc = self.sqr(acc)
            m = self.mul(acc, a)
            return jnp.where((bits[i] == 1)[..., None], m, acc)

        acc0 = jnp.broadcast_to(self.one, a.shape)
        # first bit is always 1 -> start from a
        acc0 = jnp.where((bits[0] == 1)[..., None], a, acc0)
        return jax.lax.fori_loop(1, nbits, body, acc0)

    def batch_inv(self, a, axis: int = 0):
        """Montgomery-trick batch inversion along `axis`.

        Mirrors the role of `BatchInvert` in the reference
        (/root/reference/src/regular_functions_utils.rs:1).  Zero inputs map to
        zero outputs (the reference panics instead; masking is the batched
        equivalent).

        TPU shape: the batch is folded into W parallel product chains walked
        by two `lax.scan`s (compiled-once bodies), and the W chain totals are
        Fermat-inverted in parallel.  Small batches skip the chains entirely
        (Fermat is fully parallel and the scan latency dominates there).
        """
        a = jnp.moveaxis(a, axis, 0)
        zmask = self.is_zero(a)
        safe = self.select(zmask, jnp.broadcast_to(self.one, a.shape), a)
        lead = safe.shape[:-1]
        flat = safe.reshape((-1, N_LIMBS))
        n = flat.shape[0]

        if n <= 512:
            out = self.inv(safe)
        else:
            groups = 64  # sequential scan steps; width n/64 keeps the VPU busy
            w = -(-n // groups)
            pad = groups * w - n
            ones = jnp.broadcast_to(self.one, (pad, N_LIMBS))
            m = jnp.concatenate([flat, ones], axis=0).reshape(groups, w, N_LIMBS)

            def step(carry, row):
                return self.mul(carry, row), carry

            init = jnp.broadcast_to(self.one, (w, N_LIMBS))
            totals, pre_ex = jax.lax.scan(step, init, m)
            _, suf_ex = jax.lax.scan(step, init, m, reverse=True)
            tot_inv = self.inv(totals)
            inv_flat = self.mul(self.mul(pre_ex, suf_ex), tot_inv[None])
            out = inv_flat.reshape(groups * w, N_LIMBS)[:n].reshape(lead + (N_LIMBS,))

        out = self.select(zmask, jnp.zeros_like(out), out)
        return jnp.moveaxis(out, 0, axis)


@lru_cache(maxsize=None)
def ff(spec: FieldSpec) -> FF:
    return FF(spec)
