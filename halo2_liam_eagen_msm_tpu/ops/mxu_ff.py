"""MXU-based Montgomery multiplication by a SHARED constant (prototype).

docs/MFU.md: the classic MSM/NTT path does all field math on the VPU —
~76% of the chip's multiply capacity (the MXU) idles.  A general pairwise
Montgomery mul cannot feed the MXU (both operands vary per lane, so there
is no shared matrix to contract against — see docs/DESIGN-mxu-mul.md), but
multiplication of a BATCH of elements by one shared constant IS a linear
map on the limb vector, and that covers a real workload: NTT butterfly
twiddles (shared across the pair axis), Montgomery's reduction step
(mu and p are per-field constants), and to-/from-Montgomery conversions.

Construction (exact integer arithmetic on the bf16 MXU):

  * a 254-bit element = 32 byte-planes (16 limbs x lo/hi byte), each byte
    exactly representable in bfloat16;
  * multiplying by constant c = byte-convolution = matmul with the 32x64
    Toeplitz matrix T[k, k+l] = byte_l(c): y = planes(a) @ T accumulates
    <= 32 products of (<=255)*(<=255) < 2^21 per column — EXACT in the
    MXU's float32 accumulator (< 2^24);
  * byte columns pairs-combine into 16-bit columns (< 2^29.1), which feed
    the SAME carry networks the XLA path uses (ff.FF._normalize, bound
    2^32-safe);
  * the full Montgomery mul-by-constant needs THREE such matmuls
    (a*c, T_lo*mu, m*p) — all by constants — leaving only the short carry
    chains on the VPU.

The reference gets its Montgomery core from the `ff` crate
(/root/reference/src/regular_functions_utils.rs:1-12, SURVEY.md L0); this
module is the TPU-idiomatic "put the multiplier on the matrix unit"
variant, benchmarked against the VPU paths by tools/ab_mxu_mul.py.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FieldSpec, LIMB_BITS, N_LIMBS
from .ff import MASK, U32, ff

N_BYTES = 2 * N_LIMBS  # 32 byte planes


def _bytes_of(x: int, n: int = N_BYTES) -> np.ndarray:
    return np.array([(x >> (8 * i)) & 0xFF for i in range(n)], np.float32)


@lru_cache(maxsize=None)
def _toeplitz(c: int, out_bytes: int = 2 * N_BYTES) -> "np.ndarray":
    """(32, out_bytes) bf16 Toeplitz matrix of c's bytes:
    (planes @ T)[m] = sum_{k+l=m} byte_k(a) * byte_l(c)."""
    cb = _bytes_of(c)
    T = np.zeros((N_BYTES, out_bytes), np.float32)
    for k in range(N_BYTES):
        for l in range(N_BYTES):
            if k + l < out_bytes:
                T[k, k + l] = cb[l]
    return T.astype(jnp.bfloat16)


def planes(a):
    """(..., 16) u32 16-bit limbs -> (..., 32) bf16 byte planes
    (interleaved lo/hi; exact: bytes <= 255)."""
    lo = (a & np.uint32(0xFF)).astype(jnp.bfloat16)
    hi = ((a >> np.uint32(8)) & np.uint32(0xFF)).astype(jnp.bfloat16)
    return jnp.stack([lo, hi], axis=-1).reshape(a.shape[:-1] + (N_BYTES,))


def _to_cols16(y_f32, n_cols: int):
    """(..., 2*n_cols) f32 byte columns (< 2^21, exact ints) ->
    (..., n_cols) u32 16-bit columns (< 2^21 + 2^29 < 2^29.1)."""
    y = y_f32.astype(U32)
    y = y.reshape(y.shape[:-1] + (n_cols, 2))
    return y[..., 0] + (y[..., 1] << np.uint32(8))


def prod_cols_const(a, c: int, out_cols: int = 2 * N_LIMBS):
    """MXU drop-in for ff.FF._prod_cols(a, const): u32 16-bit column sums
    of a * c.  Columns < 2^29.1 (vs the VPU path's 2^22) — still inside
    _normalize's carry-network bound."""
    T = jnp.asarray(_toeplitz(c, 2 * out_cols))
    y = jnp.dot(planes(a), T, preferred_element_type=jnp.float32)
    return _to_cols16(y, out_cols)


def mul_const(spec: FieldSpec, a, c: int):
    """Montgomery product a * c * R^-1 mod p with every multiplication on
    the MXU (three Toeplitz matmuls); only the carry networks run on the
    VPU.  c is the constant's MONTGOMERY-form integer value, exactly like
    the second operand of ff.FF.mul.  Bit-exact vs FF.mul(a, const(c))."""
    k = ff(spec)
    n = N_LIMBS
    mu = int((-pow(spec.p, -1, 1 << 256)) % (1 << 256))

    t = prod_cols_const(a, c)                      # (..., 32) cols of a*c
    t_lo, t_lo_carry = k._normalize(t[..., :n])
    # m = low16(T_lo * mu): only byte columns 0..31 needed
    m_cols = prod_cols_const(t_lo, mu, out_cols=n)
    m, _ = k._normalize(m_cols)
    u = prod_cols_const(m, spec.p)                 # (..., 32) cols of m*p
    # low halves cancel exactly: carry-out of (T_lo + U_lo) into column n
    _, lo_carry = k._normalize(t_lo + u[..., :n])
    hi = t[..., n:] + u[..., n:]                   # < 2^30.1: u32-safe
    carry0 = jnp.pad(
        (lo_carry + t_lo_carry)[..., None],
        [(0, 0)] * (hi.ndim - 1) + [(0, n - 1)],
    )
    return k._norm_sub_p(hi + carry0)


def mul_table(spec: FieldSpec, a, table):
    """Batched per-position constant multiply: a (..., n_pos, 16) times the
    per-position constants table (n_pos, 16) — the NTT twiddle-stage shape,
    tw shared across the leading batch axes.  One dot_general batched over
    n_pos: lhs (n_pos, B, 32) x rhs (n_pos, 32, 64) on the MXU.

    table: u32 (n_pos, 16) Montgomery-form limb array (device or host).
    Bit-exact vs ff.FF.mul(a, broadcast(table))."""
    k = ff(spec)
    n = N_LIMBS
    n_pos = a.shape[-2]
    lead = a.shape[:-2]
    mu = int((-pow(spec.p, -1, 1 << 256)) % (1 << 256))

    # rhs stack of Toeplitz matrices from the (host) table values
    tb = np.asarray(table)
    assert tb.shape == (n_pos, N_LIMBS)
    rhs = np.zeros((n_pos, N_BYTES, 2 * N_BYTES), np.float32)
    vals_lo = tb & 0xFF
    vals_hi = (tb >> 8) & 0xFF
    cb = np.empty((n_pos, N_BYTES), np.float32)
    cb[:, 0::2] = vals_lo
    cb[:, 1::2] = vals_hi
    for kk in range(N_BYTES):
        rhs[:, kk, kk : kk + N_BYTES] = cb
    rhs = jnp.asarray(rhs.astype(jnp.bfloat16))

    # lhs: (..., n_pos, 32) -> (n_pos, B, 32)
    pl = planes(a)
    pl2 = jnp.moveaxis(pl.reshape((-1,) + pl.shape[-2:]), 0, 1)  # (n_pos, B, 32)
    y = jax.lax.dot_general(
        pl2, rhs,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                              # (n_pos, B, 64)
    y = jnp.moveaxis(y, 0, 1).reshape(lead + (n_pos, 2 * 2 * n))
    t = _to_cols16(y, 2 * n)

    t_lo, t_lo_carry = k._normalize(t[..., :n])
    m_cols = prod_cols_const(t_lo, mu, out_cols=n)
    m, _ = k._normalize(m_cols)
    u = prod_cols_const(m, spec.p)
    _, lo_carry = k._normalize(t_lo + u[..., :n])
    hi = t[..., n:] + u[..., n:]
    carry0 = jnp.pad(
        (lo_carry + t_lo_carry)[..., None],
        [(0, 0)] * (hi.ndim - 1) + [(0, n - 1)],
    )
    return k._norm_sub_p(hi + carry0)
