"""Limb-major Pallas NTT: fused butterfly stages without per-op transposes.

Why this exists (measured, r5): the fused divisor merge spends its time in
NTT butterfly stages built from per-op pallas calls (ops/ntt.ntt_dif ->
ff.mul/add/sub -> pallas_ff.mont_mul/mont_addsub).  Every such call
transposes its operands element-major -> limb-major and back (`_to_lm` /
`_from_lm`), and every stage pays separate slice/add/sub/broadcast/mul/stack
HBM passes — ~9 full-array passes per stage where ~3 suffice.  At 2^20
argument rounds this made each merge level ~5x slower than its HBM bound
(probe_level.py; the 13.27 s/round superlinearity of BENCH r4).

Design: keep the WHOLE transform in the limb-major layout
  x_lm: (16, nb, 8, 128) uint32  — element e at [:, e//1024, (e%1024)//128,
  e%128]; transforms of a (batch, n) array use flat order e = b*n + j.
Butterfly partner j ^ s is then:
  * s >= 1024: a BLOCK-index XOR — each grid instance reads its own block
    and block i^(s/1024) and writes one block (3 HBM passes per stage);
  * s <= 512: a lane XOR (s < 128) or sublane XOR (s in 128..512) — an
    in-register roll+select, so ALL small stages run in ONE kernel launch
    (2 HBM passes for the last 10 stages together).
Stage twiddle index is e & (s-1) in every case; small stages multiply every
lane (x0 lanes by the Montgomery one) to stay branch-free.

The butterfly network is EXACTLY ops/ntt.ntt_dif / intt_dit's — outputs are
bit-identical arrays, so the fused merge's eval-domain tables and the
coefficient results are unchanged.  The reference's counterpart is the
`best_fft` import (SURVEY.md L0 external); this file is its TPU-native
speed-of-light path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import FieldSpec, N_LIMBS
from .pallas_ff import (
    FieldConsts,
    _interpret,
    field_consts,
    k_add,
    k_mul,
    k_sub,
)

BLOCK = 1024  # elements per (8, 128) tile


# ---------------------------------------------------------------------------
# layout helpers
# ---------------------------------------------------------------------------

def to_lm(x):
    """(..., E, 16) -> (16, nb, 8, 128) limb-major (E padded to BLOCK);
    leading axes are flattened into E (order preserved)."""
    e = 1
    for d in x.shape[:-1]:
        e *= d
    x = x.reshape(e, N_LIMBS)
    pad = (-e) % BLOCK
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    nb = (e + pad) // BLOCK
    return x.T.reshape(N_LIMBS, nb, 8, 128)


def from_lm(y, shape):
    """Inverse of to_lm: (16, nb, 8, 128) -> shape (+ trailing 16)."""
    e = 1
    for d in shape:
        e *= d
    return y.reshape(N_LIMBS, -1).T[:e].reshape(tuple(shape) + (N_LIMBS,))


def bcast_pairs_lm(v, n: int):
    """Per-pair values v (..., 16) -> limb-major broadcast over n
    consecutive elements each (the line/root terms of the fused merge; all
    leading axes are pair axes, flattened in order).  Only the TINY pair
    array is transposed; the big array is built by broadcast, never
    relaid."""
    vt = v.reshape(-1, N_LIMBS).T  # (16, total_pairs)
    tp = vt.shape[1]
    assert (tp * n) % BLOCK == 0
    out = jnp.broadcast_to(vt[:, :, None], (N_LIMBS, tp, n))
    return out.reshape(N_LIMBS, (tp * n) // BLOCK, 8, 128)


def bcast_table_lm(tab, m2: int):
    """Eval-domain table (n, 16) -> limb-major tiled over m2 pairs."""
    n = tab.shape[0]
    t = tab.T  # (16, n) — tiny relative to the full array
    out = jnp.broadcast_to(t[:, None, :], (N_LIMBS, m2, n))
    return out.reshape(N_LIMBS, (m2 * n) // BLOCK, 8, 128)


# ---------------------------------------------------------------------------
# elementwise lm kernels (no transposes)
# ---------------------------------------------------------------------------

def _lm_spec():
    return pl.BlockSpec(
        (N_LIMBS, 1, 8, 128), lambda i: (0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _rows0(ref):
    return [ref[i, 0] for i in range(N_LIMBS)]


def _stack0(rows):
    return jnp.stack(rows, axis=0)


@functools.partial(jax.jit, static_argnums=(0,))
def lm_mul(spec: FieldSpec, a, b):
    C = field_consts(spec)

    def kern(a_ref, b_ref, o_ref):
        o_ref[:, 0] = _stack0(k_mul(C, _rows0(a_ref), _rows0(b_ref)))

    return pl.pallas_call(
        kern, grid=(a.shape[1],),
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        in_specs=[_lm_spec()] * 2, out_specs=_lm_spec(),
        interpret=_interpret(),
    )(a, b)


@functools.partial(jax.jit, static_argnums=(0, 1))
def lm_addsub(spec: FieldSpec, is_sub: bool, a, b):
    C = field_consts(spec)

    def kern(a_ref, b_ref, o_ref):
        f = k_sub if is_sub else k_add
        o_ref[:, 0] = _stack0(f(C, _rows0(a_ref), _rows0(b_ref)))

    return pl.pallas_call(
        kern, grid=(a.shape[1],),
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        in_specs=[_lm_spec()] * 2, out_specs=_lm_spec(),
        interpret=_interpret(),
    )(a, b)


@functools.partial(jax.jit, static_argnums=(0, 2))
def lm_mul_const(spec: FieldSpec, a, c: int):
    """Montgomery product by a static constant (kernel-baked; no operand
    materialization).  c: the constant's Montgomery-form integer value."""
    from ..limbs import int_to_limbs

    C = field_consts(spec)
    cl = tuple(int(v) for v in int_to_limbs(c))

    def kern(a_ref, o_ref):
        rows = _rows0(a_ref)
        cv = [jnp.full((8, 128), np.uint32(v)) for v in cl]
        o_ref[:, 0] = _stack0(k_mul(C, rows, cv))

    return pl.pallas_call(
        kern, grid=(a.shape[1],),
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        in_specs=[_lm_spec()], out_specs=_lm_spec(),
        interpret=_interpret(),
    )(a)


def lm_add(spec, a, b):
    return lm_addsub(spec, False, a, b)


def lm_sub(spec, a, b):
    return lm_addsub(spec, True, a, b)


# ---------------------------------------------------------------------------
# butterfly stages
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def _stage_big(spec: FieldSpec, x, sb: int, inverse: bool, tw_lm):
    """One butterfly stage with block stride sb = s//BLOCK >= 1.
    tw_lm: (16, sb, 8, 128) stage twiddles, element t = j & (s-1)."""
    C = field_consts(spec)
    nb = x.shape[1]

    def kern(x_ref, y_ref, tw_ref, o_ref):
        i = pl.program_id(0)
        is_hi = (i & sb) != 0
        xv = _rows0(x_ref)
        yv = _rows0(y_ref)   # partner block i ^ sb
        tw = _rows0(tw_ref)

        if not inverse:
            # DIF: out0 = x0 + x1 ; out1 = tw * (x0 - x1)
            @pl.when(jnp.logical_not(is_hi))
            def _():
                o_ref[:, 0] = _stack0(k_add(C, xv, yv))

            @pl.when(is_hi)
            def _():
                o_ref[:, 0] = _stack0(k_mul(C, tw, k_sub(C, yv, xv)))
        else:
            # DIT: t = tw * odd ; out0 = even + t ; out1 = even - t
            @pl.when(jnp.logical_not(is_hi))
            def _():
                o_ref[:, 0] = _stack0(k_add(C, xv, k_mul(C, tw, yv)))

            @pl.when(is_hi)
            def _():
                o_ref[:, 0] = _stack0(k_sub(C, yv, k_mul(C, tw, xv)))

    return pl.pallas_call(
        kern, grid=(nb,),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
        in_specs=[
            _lm_spec(),
            pl.BlockSpec((N_LIMBS, 1, 8, 128), lambda i: (0, i ^ sb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_LIMBS, 1, 8, 128), lambda i: (0, i & (sb - 1),
                                                          0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=_lm_spec(),
        interpret=_interpret(),
    )(x, x, tw_lm)


def _xor_partner(rows, s: int):
    """Partner rows x[e ^ s] for s <= 512 via single-axis roll+select.
    Element layout within a block: e = sublane*128 + lane, so bit s of e
    lives in the lane index for s < 128 and in the sublane index above.
    roll semantics match jnp.roll: out[i] = x[i - shift] (wrapping); the
    select keeps only the in-group side, so wraparound never leaks."""
    if s < 128:
        axis, sh, size, dim = 1, s, 128, 1
    else:
        axis, sh, size, dim = 0, s // 128, 8, 0
    bit = (jax.lax.broadcasted_iota(jnp.uint32, (8, 128), dim)
           & np.uint32(sh)) != 0
    out = []
    for r in rows:
        fwd = pltpu.roll(r, size - sh, axis)  # out[e] = x[e + sh]
        bwd = pltpu.roll(r, sh, axis)         # out[e] = x[e - sh]
        out.append(jnp.where(bit, bwd, fwd))
    return out, bit


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def _stages_small(spec: FieldSpec, x, stages: tuple, inverse: bool, tw_exp):
    """ALL stages with s <= 512 in one launch.  stages: tuple of s values in
    execution order.  tw_exp: (n_stages, 16, 8, 128) expanded per-element
    twiddles — for the forward direction x0 lanes hold the Montgomery one
    (branch-free: every lane multiplies); for the inverse the pair's shared
    twiddle is expanded to both lanes."""
    C = field_consts(spec)
    nb = x.shape[1]

    def kern(x_ref, tw_ref, o_ref):
        rows = _rows0(x_ref)
        for idx, s in enumerate(stages):
            tw = [tw_ref[idx, i] for i in range(N_LIMBS)]
            partner, bit = _xor_partner(rows, s)
            if not inverse:
                # d = x0+x1 on low lanes, x0-x1 on high; then * tw (tw=one
                # on low lanes)
                add_ = k_add(C, rows, partner)
                sub_ = k_sub(C, partner, rows)  # on high lanes: x0 - x1
                d = [jnp.where(bit, s_, a_) for s_, a_ in zip(sub_, add_)]
                rows = k_mul(C, d, tw)
            else:
                odd = [jnp.where(bit, r, p) for r, p in zip(rows, partner)]
                t = k_mul(C, odd, tw)
                add_ = k_add(C, rows, t)      # valid on low lanes
                sub_ = k_sub(C, partner, t)   # valid on high lanes
                rows = [jnp.where(bit, s_, a_)
                        for s_, a_ in zip(sub_, add_)]
        o_ref[:, 0] = _stack0(rows)

    tw_spec = pl.BlockSpec(
        (len(stages), N_LIMBS, 8, 128), lambda i: (0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kern, grid=(nb,),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
        in_specs=[_lm_spec(), tw_spec], out_specs=_lm_spec(),
        interpret=_interpret(),
    )(x, tw_exp)


# ---------------------------------------------------------------------------
# twiddle table preparation (host, cached per (field, logn))
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def tables_host(spec: FieldSpec, logn: int, inverse: bool):
    """HOST twiddle tables for a size-2^logn transform:
    (big: tuple of (s, (16, s//BLOCK, 8, 128) np array) big->small,
     small_s: tuple of s values in execution order,
     small: (n_small, 16, 8, 128) np expanded per-element tables).

    Numpy on purpose (same doctrine as parallel.dist_ntt.dist_consts):
    device caching would leak mesh-typed constants across shard_map traces.
    Large callers pass device copies as jit OPERANDS via
    divisor._fused_consts_dev (HLO-constant payloads get rejected by the
    axon tunnel); small in-shard_map callers inline them as trace consts."""
    from .ntt import _twiddle_flat_host
    from ..limbs import int_to_limbs

    n = 1 << logn
    flat = _twiddle_flat_host(spec, logn, inverse)  # (n-1, 16) stage-major
    one = np.array(int_to_limbs(spec.r_mod_p), np.uint32)

    def stage_tab(s):
        return flat[s - 1: 2 * s - 1]  # (s, 16) twiddles of stage m = 2s

    big = []
    s = n // 2
    while s >= BLOCK:
        t = np.ascontiguousarray(stage_tab(s).T).reshape(
            N_LIMBS, s // BLOCK, 8, 128)
        big.append((s, t))
        s //= 2

    small_s = []
    s = min(n // 2, 512)
    while s >= 1:
        small_s.append(s)
        s //= 2
    if inverse:
        small_s = small_s[::-1]
    exp = np.empty((len(small_s), N_LIMBS, BLOCK), np.uint32)
    e_idx = np.arange(BLOCK)
    for idx, s in enumerate(small_s):
        tab = stage_tab(s)  # (s, 16)
        vals = tab[e_idx & (s - 1)]  # (1024, 16)
        if not inverse:
            # x0 lanes multiply by one (branch-free fwd butterfly)
            lo = (e_idx & s) == 0
            vals = np.where(lo[:, None], one[None, :], vals)
        exp[idx] = vals.T
    small = exp.reshape(len(small_s), N_LIMBS, 8, 128)
    return tuple(big), tuple(small_s), small


def tables_op(spec: FieldSpec, logn: int, inverse: bool):
    """tables_host as a jit-operand pytree: (tuple of big arrays big->small,
    small expanded array).  Convert with jnp.asarray at the call site that
    owns device placement."""
    big, small_s, small = tables_host(spec, logn, inverse)
    return tuple(t for _, t in big), small


# ---------------------------------------------------------------------------
# full transforms (bit-identical to ops/ntt.ntt_dif / intt_dit)
# ---------------------------------------------------------------------------

def ntt_dif_lm(spec: FieldSpec, x_lm, logn: int, tabs=None):
    """Forward DIF on limb-major data: element order e = b*n + j, n=2^logn.
    tabs: optional (big_tuple, small_array) operand pytree (tables_op);
    None inlines host tables as trace constants (small sizes only)."""
    _, small_s, _ = tables_host(spec, logn, False)
    if tabs is None:
        big_ops, small_op = tables_op(spec, logn, False)
    else:
        big_ops, small_op = tabs
    s = (1 << logn) // 2
    i = 0
    while s >= BLOCK:
        x_lm = _stage_big(spec, x_lm, s // BLOCK, False,
                          jnp.asarray(big_ops[i]))
        s //= 2
        i += 1
    if small_s:
        x_lm = _stages_small(spec, x_lm, small_s, False,
                             jnp.asarray(small_op))
    return x_lm


def intt_dit_lm(spec: FieldSpec, x_lm, logn: int, tabs=None):
    """Inverse DIT on limb-major data (NO 1/n scale — the fused merge folds
    it into the denominator batch inversion)."""
    _, small_s, _ = tables_host(spec, logn, True)
    if tabs is None:
        big_ops, small_op = tables_op(spec, logn, True)
    else:
        big_ops, small_op = tabs
    if small_s:
        x_lm = _stages_small(spec, x_lm, small_s, True,
                             jnp.asarray(small_op))
    s = BLOCK
    n = 1 << logn
    i = len(big_ops) - 1
    while s <= n // 2:
        x_lm = _stage_big(spec, x_lm, s // BLOCK, True,
                          jnp.asarray(big_ops[i]))
        s *= 2
        i -= 1
    return x_lm
