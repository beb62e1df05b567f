"""Polynomial algebra over prime fields, batched for TPU.

TPU-native counterpart of the reference's `Polynomial`
(/root/reference/src/regular_functions_utils.rs:26-216) and the L0 helpers it
imports (`eval_polynomial`, `kate_division`).  Design differences, by intent:

  * coefficients live in (..., L, 16) Montgomery limb tensors with static
    (padded) length L; semantic lengths are tracked by the caller — trailing
    zeros never change results, only the Rust Vec lengths
  * evaluation is powers-of-x + lazy-reduced dot product instead of serial
    Horner (log-depth, VPU-wide)
  * kate division (synthetic division by (x - b), remainder dropped,
    reference :45-47) is reformulated as suffix sums of c_j * b^j scaled by
    inverse powers — a scan instead of the O(n) serial recurrence
  * short products use one batched coefficient outer product + anti-diagonal
    lazy sums; long products use the NTT; the dispatch threshold matches the
    reference's len < 32 rule (:213)

All functions are pure and vmap/jit-safe; `Poly` is a thin host convenience
wrapper with exact-length Rust-equivalent semantics for tests/oracles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FieldSpec, N_LIMBS
from ..limbs import ints_to_mont_limbs, mont_limbs_to_ints
from .ff import ff
from .ntt import intt_dit, ntt, ntt_dif

NAIVE_THRESHOLD = 32  # reference regular_functions_utils.rs:213


def powers(spec: FieldSpec, x, n: int):
    """(..., n, 16): [1, x, x^2, ..., x^(n-1)] via log-depth prefix products."""
    k = ff(spec)
    reps = jnp.broadcast_to(x[..., None, :], x.shape[:-1] + (n, N_LIMBS))
    one = jnp.broadcast_to(k.one, x.shape[:-1] + (1, N_LIMBS))
    seq = jnp.concatenate([one, reps[..., : n - 1, :]], axis=-2)
    return jax.lax.associative_scan(k.mul, seq, axis=seq.ndim - 2)


def eval_poly(spec: FieldSpec, coeffs, x):
    """Evaluate (..., L, 16) coefficient tensors at x (..., 16).
    Same result as the reference's Horner `eval_polynomial` (used at :42)."""
    k = ff(spec)
    n = coeffs.shape[-2]
    pw = powers(spec, x, n)
    return k.dot(coeffs, pw, axis=-2)


def kate_div(spec: FieldSpec, coeffs, b):
    """Synthetic division by (x - b), dropping the remainder: returns q with
    q_k = sum_{j>k} c_j b^(j-1-k)  (reference kate_division semantics, :45-47).

    Output length = input length - 1 ... represented padded: returns a tensor
    of the SAME static length with the last coefficient zeroed; callers track
    the semantic length.  Parallel formulation (b != 0):
        q_k = (suffix_sum_{j>k} c_j b^j) * b^(-k-1)
    For b == 0 the quotient is just a shift — mask-selected.
    """
    k = ff(spec)
    n = coeffs.shape[-2]
    if n <= 1:
        return jnp.zeros_like(coeffs)
    if n <= 64:
        # short polys: sequential synthetic division via lax.scan — the
        # compiled body is one mul+add, much smaller than the powers/scan
        # graph, and no inverse is needed (b = 0 included naturally)
        rev = jnp.flip(coeffs, axis=-2)          # c_{n-1} ... c_0
        xs = jnp.moveaxis(rev[..., : n - 1, :], -2, 0)  # scan over c_{n-1}..c_1

        def body(carry, cj):
            q = k.add(cj, k.mul(b, carry))
            return q, q

        _, qs = jax.lax.scan(body, jnp.zeros_like(b), xs)
        # qs = q_{n-2}, q_{n-3}, ..., q_0  -> reverse and append a zero
        q = jnp.flip(jnp.moveaxis(qs, 0, -2), axis=-2)
        return jnp.concatenate([q, jnp.zeros_like(q[..., :1, :])], axis=-2)
    b_is_zero = k.is_zero(b)
    safe_b = k.select(b_is_zero, jnp.broadcast_to(k.one, b.shape), b)
    b_inv = k.inv(safe_b)
    pw = powers(spec, safe_b, n)            # b^j
    pw_inv = powers(spec, b_inv, n)         # b^-j
    d = k.mul(coeffs, pw)                   # c_j b^j
    # suffix sums: S_k = sum_{j >= k} d_j ; we need sum_{j > k} = S_{k+1}
    suf = jax.lax.associative_scan(k.add, d, axis=d.ndim - 2, reverse=True)
    s_next = jnp.concatenate(
        [suf[..., 1:, :], jnp.zeros_like(suf[..., :1, :])], axis=-2
    )
    # q_k = S_{k+1} * b^(-k) * b^-1
    q = k.mul(k.mul(s_next, pw_inv), b_inv[..., None, :])
    # b == 0: quotient is coeffs shifted down by one
    shifted = jnp.concatenate(
        [coeffs[..., 1:, :], jnp.zeros_like(coeffs[..., :1, :])], axis=-2
    )
    return k.select(b_is_zero[..., None], shifted, q)


def mul_naive(spec: FieldSpec, a, b):
    """Schoolbook product of (..., La, 16) x (..., Lb, 16) -> (..., La+Lb-1, 16).
    One batched Montgomery multiply for all La*Lb coefficient pairs, then
    anti-diagonal lazy column sums + a single reduction per output coeff.
    Requires min(La, Lb) <= 2^13 to keep uint32 column sums exact."""
    k = ff(spec)
    if a.shape[-2] > b.shape[-2]:
        a, b = b, a  # keep the anti-diagonal row axis (and sum count) short
    la, lb = a.shape[-2], b.shape[-2]
    assert la <= (1 << 13)
    outer = k.mul(a[..., :, None, :], b[..., None, :, :])  # (..., La, Lb, 16)
    # anti-diagonal sums over (i, j) -> i + j: pad the j-axis to stride
    # (la + lb) and re-view rows at width (la + lb - 1), which lands element
    # (i, j) at (i, i + j); spillover hits only zero padding
    lead = outer.shape[:-3]
    nout = la + lb - 1
    padded = jnp.pad(outer, [(0, 0)] * len(lead) + [(0, 0), (0, la), (0, 0)])
    flat = padded.reshape(lead + (la * (lb + la), N_LIMBS))
    flat = flat[..., : la * (lb + la - 1), :]
    diag = flat.reshape(lead + (la, lb + la - 1, N_LIMBS))
    cols = diag.sum(axis=-3, dtype=jnp.uint32)  # (..., La+Lb-1, 16) lazy sums
    cols = cols[..., :nout, :]
    return k.reduce_columns(cols)


def mul_fft(spec: FieldSpec, a, b, out_len: int | None = None):
    """NTT product (reference mul_fft, :102-129).  Pads to the next power of
    two >= La+Lb-1 (the reference always pads to 2^(floor(log2(len))+1) —
    a strictly larger size; coefficient results are identical)."""
    k = ff(spec)
    la, lb = a.shape[-2], b.shape[-2]
    length = la + lb - 1
    n = 1 << (length - 1).bit_length()
    # gather-free pair: pointwise product in the shared bit-reversed
    # evaluation order, inverse back to natural coefficients (no on-device
    # bit-reversal permutations; see ops/ntt.py)
    fa = ntt_dif(spec, _pad_to(a, n))
    fb = ntt_dif(spec, _pad_to(b, n))
    prod = k.mul(fa, fb)
    res = intt_dit(spec, prod)
    return res[..., : (out_len or length), :]


def _pad_to(a, n):
    la = a.shape[-2]
    if la == n:
        return a
    return jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, n - la), (0, 0)])


def mul_auto(spec: FieldSpec, a, b):
    """Dispatch: naive if either operand shorter than 32, else NTT
    (reference Mul impl, :209-216)."""
    if a.shape[-2] < NAIVE_THRESHOLD or b.shape[-2] < NAIVE_THRESHOLD:
        return mul_naive(spec, a, b)
    return mul_fft(spec, a, b)


def add_padded(spec: FieldSpec, a, b):
    """Coefficient-wise sum, result length max(La, Lb) (reference Add, :178-195)."""
    k = ff(spec)
    la, lb = a.shape[-2], b.shape[-2]
    n = max(la, lb)
    return k.add(_pad_to(a, n), _pad_to(b, n))


def scale(spec: FieldSpec, a, sc):
    return ff(spec).mul(a, sc[..., None, :])


def shr(spec: FieldSpec, a, k_shift: int):
    """Multiply by x^k: prepend k zero coefficients (reference Shr, :167-176)."""
    return jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(k_shift, 0), (0, 0)])


# ---------------------------------------------------------------------------
# Host-facing exact-length polynomial (oracle / small-scale convenience).
# ---------------------------------------------------------------------------

class Poly:
    """Exact-length polynomial over `spec`, mirroring the Rust `Polynomial`
    semantics (lengths included) for tests and host-side orchestration.
    Coefficients stored as canonical Python ints."""

    def __init__(self, spec: FieldSpec, coeffs):
        self.spec = spec
        self.coeffs = [c % spec.p for c in coeffs]

    def __len__(self):
        return len(self.coeffs)

    def __eq__(self, other):
        return self.spec is other.spec and self.coeffs == other.coeffs

    def ev(self, x: int) -> int:
        acc = 0
        for c in reversed(self.coeffs):
            acc = (acc * x + c) % self.spec.p
        return acc

    def kate_div(self, b: int) -> "Poly":
        """Drops remainder and one coefficient (reference :45-47, checked by
        poly_test's no-leading-zero-pad property :574-577)."""
        n = len(self.coeffs)
        if n == 0:
            return Poly(self.spec, [])
        q = [0] * (n - 1)
        acc = 0
        for j in range(n - 1, 0, -1):
            acc = (acc * b + self.coeffs[j]) % self.spec.p
            q[j - 1] = acc
        return Poly(self.spec, q)

    def scale(self, sc: int) -> "Poly":
        return Poly(self.spec, [c * sc % self.spec.p for c in self.coeffs])

    def __add__(self, other: "Poly") -> "Poly":
        n = max(len(self.coeffs), len(other.coeffs))
        a = self.coeffs + [0] * (n - len(self.coeffs))
        b = other.coeffs + [0] * (n - len(other.coeffs))
        return Poly(self.spec, [(x + y) % self.spec.p for x, y in zip(a, b)])

    def __rshift__(self, k: int) -> "Poly":
        return Poly(self.spec, [0] * k + self.coeffs)

    def mul_naive(self, other: "Poly") -> "Poly":
        la, lb = len(self.coeffs), len(other.coeffs)
        out = [0] * (la + lb - 1)
        for i, x in enumerate(self.coeffs):
            for j, y in enumerate(other.coeffs):
                out[i + j] = (out[i + j] + x * y) % self.spec.p
        return Poly(self.spec, out)

    def mul_karatsuba(self, other: "Poly") -> "Poly":
        """Karatsuba split-multiply (reference :66-99; upstream notes it is
        'absolutely useless' vs naive/FFT :64-65 — kept for API parity)."""
        a, b = self.coeffs, other.coeffs
        if len(a) <= 1 or len(b) <= 1:
            return self.mul_naive(other)
        d = max(len(a), len(b)) // 2
        a_l, a_r = Poly(self.spec, a[:d]), Poly(self.spec, a[d:])
        b_l, b_r = Poly(self.spec, b[:d]), Poly(self.spec, b[d:])
        m0 = a_l.mul_karatsuba(b_l)
        m2 = a_r.mul_karatsuba(b_r)
        m1 = (a_l + a_r).mul_karatsuba(b_l + b_r) + (m0 + m2).scale(-1)
        return m0 + (m1 >> d) + (m2 >> (2 * d))

    def __mul__(self, other: "Poly") -> "Poly":
        return self.mul_naive(other)

    # -- device bridging ----------------------------------------------------
    def to_device(self, pad_len: int | None = None):
        n = pad_len or len(self.coeffs)
        cs = self.coeffs + [0] * (n - len(self.coeffs))
        return jnp.asarray(ints_to_mont_limbs(cs, self.spec))

    @classmethod
    def from_device(cls, spec: FieldSpec, arr, length: int | None = None):
        ints = mont_limbs_to_ints(np.asarray(arr).reshape(-1, N_LIMBS), spec)
        if length is not None:
            ints = ints[:length]
        return cls(spec, ints)
