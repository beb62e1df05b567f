"""MXU radix-shuffle point reordering for the Pippenger MSM.

Replaces the per-window sorted-point gather — measured 33.3 ms of a 53.3 ms
window at n = 2^20 on TPU v5e (62% of window time; XLA:TPU gathers cost ~22
cycles PER INDEX regardless of access pattern) — with one-hot matmul
permutations on the MXU plus slot-granular data movement, per
docs/DESIGN-mxu-gather.md.  This is the TPU answer to the data-dependent
scatter the reference gets for free on CPU inside `best_multiexp`
(/root/reference/src/argument_witness_calc.rs:144, halo2 fork arithmetic):
there is no per-lane scatter unit on TPU, but the MXU can apply a
permutation as a one-hot matrix multiply, exactly.

Payload layout: points travel as 16 uint32 lanes per row — x and y each
packed 8 x u32 (two 16-bit Montgomery limbs per word), so a row's byte
planes are 64 bf16 lanes (not 128): every one-hot matmul and every HBM
stream is half the naive 16-lane-per-coordinate layout.  The window key
rides in its own lane (col 16), permuted by a second 16-plane matmul that
reuses the same one-hot operand.

Pipeline (per c-bit window, key = bucket id, split c = cb coarse | fb fine):

  pass A (pallas, grid over tiles of T rows; two kernels so each fits VMEM):
    - rank kernel: within-(tile, partition) ranks by coarse id via one-hot
      columns + log-shift cumsum; identity inputs (x = y = 0) are DROPPED
      (they contribute nothing to any bucket); rows ranked past the slot
      capacity S get spill ranks; per-partition counts out
    - shuffle kernel: permute payload+key into the slot-padded coarse image
      [P partitions x S rows | SP spill rows] via (strip x T) @ (T x 64|16)
      bf16 one-hot matmuls over byte planes — exact, since planes are < 256
    - spills (~1.5% of rows at S = 1.5x mean) are handled exactly by the
      classic sort+gather path; SP overflow raises a flag -> full fallback
  XLA glue: transpose the (tile, partition) slot grid to partition-major —
    contiguous (S x 80B) chunks at memcpy speed; THIS is what makes the
    global regroup free: no per-run DMAs, no row gathers.
  pass B (pallas, grid over P partitions):
    - row validity is content-based (all-zero row <=> empty slot / dropped
      identity), no slot-count streaming needed
    - stable counting sort by fine id + compaction via a second one-hot
      matmul; invalid rows sort to the tail as zeros; per-fine counts out
  compact (pallas, single step): one ordered HBM->HBM DMA per partition
    copies its R_pad rows to the 64-row-aligned base4[p]; the strict issue
    order makes partition p+1's rows overwrite p's zero tail, leaving a
    bucket-contiguous stream with <= 63 zero ghost rows (exact identities)
    between partitions.  hi[b=(p,f)] = base4[p] + within-partition count - 1
    matches ops/msm.bucket_bounds_hist's boundary convention on that stream.

Mosaic hazards pinned down on real v5e by tools/probe_radix.py:
  * byte reassembly MUST be multiply-add (b0 + 256*b1 + 65536*b2 + ...),
    never left-shifts of lane-sliced tensors (those mis-lower and zero
    bytes < 128); int32 wrap on the b3 term is exact
  * jnp.cumsum has no TPU lowering — log-shift cumsum via pltpu.roll
    (32-bit dtypes only)
  * f32 -> uint32 casts are unsupported — go through int32
  * int8 MXU matmuls mis-pack RHS planes beyond lane 32 — use bf16
  * 1D HBM memrefs slice at 1024-element granularity (hence the 64-row
    ghost alignment of 16-lane rows, asserted via pl.multiple_of)
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


GHOST = 64  # ghost alignment rows: 64 rows x 16 lanes = 1024 elements


@dataclass(frozen=True)
class RadixPlan:
    n: int            # points (multiple of T)
    c: int            # window bits
    T: int            # tile rows
    n_tiles: int
    cb: int           # coarse bits
    fb: int           # fine bits (c = cb + fb)
    P: int            # 2^cb coarse partitions
    S: int            # slot rows per (tile, partition)
    SP: int           # spill capacity rows per tile
    OUT_ROWS: int     # pass A tile image rows (P*S + SP padded to SH)
    SH: int           # pass A output strip height
    R: int            # n_tiles * S rows per partition entering pass B
    R_pad: int        # R padded to SHB and the ghost unit
    SHB: int          # pass B output strip height
    FB_COLS: int      # lanes holding fine columns (>= 2^fb + 1, mult of 128)
    n_ext: int        # output stream rows: n + ghost padding per partition


def make_plan(n: int, c: int, T: int | None = None) -> RadixPlan:
    """Shapes for the two-pass shuffle.  T = 4096 keeps the mean slot
    occupancy at T/P = 8 (S = 12 -> 1.5x padding, ~1.5% spill rate for
    uniform keys); smaller n shrinks T for the CPU-interpret tests."""
    if T is None:
        T = min(4096, n)
    assert n % T == 0 and T % 256 == 0, (n, T)
    n_tiles = n // T
    cb = max(1, min(9, c - 1, T.bit_length() - 1 - 2))
    fb = c - cb
    P = 1 << cb
    mean = T // P
    # slot capacity: ~mean + 3 sigma is NOT enough — with P*n_tiles*W
    # (tile, partition, window) cells per MSM, even 2% per-tile overflow
    # probability fires nearly every run and the exact fallback eats the
    # win.  mean + max(8, mean) (2x padding) puts uniform-key overflow at
    # ~0 while only growing pass-B work (the scan stream length does not
    # depend on S); skewed windows (top-of-modulus digits) still spill
    # ~10% of rows into the exact side path, which absorbs them.
    S = mean + max(8, mean)
    SP = max(128, T // 32)
    raw = P * S + SP
    SH = 512 if raw >= 512 else raw
    OUT_ROWS = _cdiv(raw, SH) * SH
    R = n_tiles * S
    # ghost-align FIRST (flat DMA slices 1024-element units), then pick the
    # strip height as a divisor of R_pad — GHOST | 512 so both orders of
    # rounding agree for R >= 512, and small R gets a single full strip
    # (choosing SHB before the ghost rounding left R_pad % SHB != 0 rows
    # of the pass-B output unwritten at small shapes)
    R_pad = _cdiv(R, GHOST) * GHOST
    SHB = 512 if R_pad >= 512 else R_pad
    R_pad = _cdiv(R_pad, SHB) * SHB
    FB_COLS = _cdiv((1 << fb) + 1, 128) * 128
    n_ext = n + GHOST * P
    return RadixPlan(n, c, T, n_tiles, cb, fb, P, S, SP, OUT_ROWS, SH,
                     R, R_pad, SHB, FB_COLS, n_ext)


# ---------------------------------------------------------------------------
# payload packing (XLA level, once per MSM)
# ---------------------------------------------------------------------------

def pack_payload(ax, ay):
    """(n, 16) x/y uint32 16-bit-limb arrays -> (n, 16) packed payload:
    cols 0..7 = x limbs pairwise packed (limb 2i | limb 2i+1 << 16),
    cols 8..15 = y likewise.  The affine identity (0, 0) stays all-zero."""
    def pack(v):
        return v[:, 0::2] | (v[:, 1::2] << 16)
    return jnp.concatenate([pack(ax), pack(ay)], axis=1)


def unpack_payload(rows):
    """(m, 16) packed payload -> (sx, sy) (m, 16) 16-bit-limb arrays."""
    def unpack(v):
        lo = v & 0xFFFF
        hi = v >> 16
        return jnp.stack([lo, hi], axis=2).reshape(v.shape[0], 16)
    return unpack(rows[:, :8]), unpack(rows[:, 8:16])


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------

def _cumsum_rows(x):
    """Inclusive cumsum along axis 0 (sublanes) — log-shift via pltpu.roll
    (jnp.cumsum has no Mosaic lowering; roll supports 32-bit dtypes only)."""
    nr = x.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    d = 1
    while d < nr:
        sh = pltpu.roll(x, shift=d, axis=0)
        x = x + jnp.where(rows < d, jnp.zeros((), x.dtype), sh)
        d *= 2
    return x


def _cumsum_lanes_excl(row):
    """Exclusive cumsum along the last axis of a (1, L) f32 row."""
    L = row.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    inc = row
    d = 1
    while d < L:
        sh = pltpu.roll(inc, shift=d, axis=1)
        inc = inc + jnp.where(cols < d, 0.0, sh)
        d *= 2
    return inc - row


def _planes_bf16(cols_u32):
    """(T, C) uint32 -> (T, 4C) bf16 byte planes [b0 xC | b1 xC | b2 xC |
    b3 xC]; full-tensor shifts only (lane-slice shifts mis-lower)."""
    ps = [((cols_u32 >> (8 * k)) & 0xFF).astype(jnp.int32) for k in range(4)]
    return jnp.concatenate(ps, axis=1).astype(jnp.bfloat16)


def _reassemble(acc):
    """(m, 4C) f32 byte-plane matmul result -> (m, C) uint32 words.
    Multiply-add only; the b3 term wraps int32 exactly (verified on-chip)."""
    b = acc.astype(jnp.int32)
    C = b.shape[1] // 4
    return (b[:, 0:C] + b[:, C:2 * C] * 256 + b[:, 2 * C:3 * C] * 65536
            + b[:, 3 * C:4 * C] * 16777216).astype(jnp.uint32)


def _permute_strips(dst, main_planes, aux_planes, out_rows, strip, write):
    """Apply the permutation src -> dst[src] with one-hot matmuls per output
    strip; write(strip_idx, (strip, C) uint32 main, aux or None).  Rows with
    no source come out all-zero."""
    dd0 = jax.lax.broadcasted_iota(jnp.int32, (strip, 1), 0)
    for k in range(out_rows // strip):
        oh = ((dd0 + k * strip) == dst[None, :]).astype(jnp.bfloat16)
        accm = jax.lax.dot_general(
            oh, main_planes, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        main = _reassemble(accm)
        aux = None
        if aux_planes is not None:
            acca = jax.lax.dot_general(
                oh, aux_planes, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            aux = _reassemble(acca)
        write(k, main, aux)


# ---------------------------------------------------------------------------
# pass A
# ---------------------------------------------------------------------------

def _rank_kernel(plan: RadixPlan, keys_ref, pay_ref, dst_ref, cnt_ref):
    """Per tile: within-(tile, partition) ranks -> one-hot destinations."""
    T, P, S = plan.T, plan.P, plan.S
    kv = keys_ref[0, 0, :]  # (T,) int32 window keys in [0, 2^c)
    pay = pay_ref[:]        # (T, 16) packed payload
    coarse = kv >> plan.fb

    # identity inputs (x = y = 0 rows) are dropped
    valid = jnp.sum((pay != 0).astype(jnp.int32), axis=1) > 0  # (T,)

    # ranks within (tile, coarse partition) + per-partition counts
    # (pltpu.roll is 32-bit only, so the cumsum stays f32)
    p_cols = max(128, P)
    cols0 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    ranks = jnp.zeros((T,), jnp.float32)
    for s in range(p_cols // 128):
        oh = ((coarse[:, None] == (cols0 + s * 128))
              & valid[:, None]).astype(jnp.float32)
        csum = _cumsum_rows(oh)
        ranks = ranks + jnp.sum((csum - oh) * oh, axis=1)
        if s * 128 < P:
            cnt_ref[0, 0, s * 128:(s + 1) * 128] = csum[T - 1, :].astype(jnp.int32)
    rank = ranks.astype(jnp.int32)

    # spill ranks for rows past their slot capacity
    spill = valid & (rank >= S)
    sp_csum = _cumsum_rows(spill.astype(jnp.float32)[:, None])[:, 0]
    sp_rank = sp_csum.astype(jnp.int32) - 1
    dst = jnp.where(spill, P * S + sp_rank, coarse * S + jnp.minimum(rank, S - 1))
    # invalid rows and spill-capacity overflow -> dropped (no one-hot target;
    # overflow is detected in XLA from the counts and triggers full fallback)
    oob = (~valid) | (spill & (sp_rank >= plan.SP))
    dst_ref[0, 0, :] = jnp.where(oob, plan.OUT_ROWS, dst)


def _shuffle_kernel(plan: RadixPlan, keys_ref, dst_ref, pay_ref, out_ref,
                    planes_scr, aux_scr):
    """Grid (tile, strip): permute payload + key into one strip of the
    slot-padded coarse image.  Byte planes are computed once per tile into
    VMEM scratch (scratch persists across grid steps; the strip axis is the
    minor grid dimension so k == 0 runs first for every tile)."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        kv = keys_ref[0, 0, :]
        planes_scr[:] = _planes_bf16(pay_ref[:])  # (T, 64)
        # aux: key in col 0 of a 4-col group (16 planes, proven minimum)
        lane4 = jax.lax.broadcasted_iota(jnp.int32, (plan.T, 4), 1)
        aux = jnp.where(lane4 == 0, kv[:, None], 0).astype(jnp.uint32)
        aux_scr[:] = _planes_bf16(aux)            # (T, 16)

    dst = dst_ref[0, 0, :]

    def write(_k, main, auxv):
        out_ref[0, :, 0:16] = main
        out_ref[0, :, 16:20] = auxv

    dd0 = jax.lax.broadcasted_iota(jnp.int32, (plan.SH, 1), 0)
    oh = ((dd0 + k * plan.SH) == dst[None, :]).astype(jnp.bfloat16)
    accm = jax.lax.dot_general(
        oh, planes_scr[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acca = jax.lax.dot_general(
        oh, aux_scr[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    write(k, _reassemble(accm), _reassemble(acca))


def _pass_a_call(plan: RadixPlan, keys2, pay):
    """keys2 (n_tiles, 1, T) int32; pay (n, 16) packed uint32 ->
    (tiles (n_tiles, OUT_ROWS, 20) uint32 [cols 0..15 payload, col 16 key],
     counts (n_tiles, 1, P_COLS) int32).

    Two kernels (ranks, then shuffle) with the (n,) dst vector round-tripping
    HBM: each kernel's VMEM working set fits the 16 MB scoped limit, and the
    4 MB of extra traffic is noise next to the payload streams."""
    p_cols = max(128, plan.P)
    key_spec = pl.BlockSpec((1, 1, plan.T), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    pay_spec = pl.BlockSpec((plan.T, 16), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    dst, cnt = pl.pallas_call(
        functools.partial(_rank_kernel, plan),
        grid=(plan.n_tiles,),
        out_shape=(
            jax.ShapeDtypeStruct((plan.n_tiles, 1, plan.T), jnp.int32),
            jax.ShapeDtypeStruct((plan.n_tiles, 1, p_cols), jnp.int32),
        ),
        in_specs=[key_spec, pay_spec],
        out_specs=(
            pl.BlockSpec((1, 1, plan.T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p_cols), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(keys2, pay)
    n_strips = plan.OUT_ROWS // plan.SH
    tiles = pl.pallas_call(
        functools.partial(_shuffle_kernel, plan),
        grid=(plan.n_tiles, n_strips),
        out_shape=jax.ShapeDtypeStruct(
            (plan.n_tiles, plan.OUT_ROWS, 20), jnp.uint32
        ),
        in_specs=[pl.BlockSpec((1, 1, plan.T), lambda i, k: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, plan.T), lambda i, k: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((plan.T, 16), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, plan.SH, 20), lambda i, k: (i, k, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((plan.T, 64), jnp.bfloat16),
            pltpu.VMEM((plan.T, 16), jnp.bfloat16),
        ],
        interpret=_interpret(),
    )(keys2, dst, pay)
    return tiles, cnt


# ---------------------------------------------------------------------------
# pass B
# ---------------------------------------------------------------------------

def _pass_b_kernel(plan: RadixPlan, main_ref, out_ref, fc_ref):
    R, fb = plan.R, plan.fb
    nfine = 1 << fb
    rows = main_ref[0]  # (R, 20) uint32: payload cols 0..15, key col 16
    key = rows[:, 16].astype(jnp.int32)
    pay = rows[:, 0:16]
    valid = jnp.sum((pay != 0).astype(jnp.int32), axis=1) > 0
    fine = jnp.where(valid, key & (nfine - 1), nfine)

    # stable counting sort by fine id (sentinel nfine = invalid -> tail)
    assert plan.FB_COLS == 128, "fb > 6 would need strip loops here"
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    oh = (fine[:, None] == cols).astype(jnp.float32)
    csum = _cumsum_rows(oh)
    fcnt = csum[R - 1, :]  # (128,) per-fine counts (col nfine = invalid)
    rank = jnp.sum((csum - oh) * oh, axis=1)
    fbase = _cumsum_lanes_excl(fcnt[None, :])  # (1, 128) exclusive
    base_at = jnp.sum(fbase * oh, axis=1)
    dst = (base_at + rank).astype(jnp.int32)

    main_planes = _planes_bf16(pay)

    def write(k, out_rows, _aux):
        out_ref[0, pl.ds(k * plan.SHB, plan.SHB), :] = out_rows

    _permute_strips(dst, main_planes, None, plan.R_pad, plan.SHB, write)
    fc_ref[0, 0, :] = fcnt.astype(jnp.int32)


def _pass_b_call(plan: RadixPlan, main):
    """main (P, R, 20) uint32 -> (parts (P, R_pad, 16) uint32 [valid rows
    fine-sorted first, zero tail], fine counts (P, 1, FB_COLS) int32)."""
    kern = functools.partial(_pass_b_kernel, plan)
    return pl.pallas_call(
        kern,
        grid=(plan.P,),
        out_shape=(
            jax.ShapeDtypeStruct((plan.P, plan.R_pad, 16), jnp.uint32),
            jax.ShapeDtypeStruct((plan.P, 1, plan.FB_COLS), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((1, plan.R, 20), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, plan.R_pad, 16), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, plan.FB_COLS), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(main)


# ---------------------------------------------------------------------------
# compaction
# ---------------------------------------------------------------------------

def _compact_kernel(plan: RadixPlan, base4_ref, parts_ref, out_ref, sem):
    L = plan.R_pad * 16

    # ONE grid step issuing P strictly ordered HBM->HBM DMAs (partition p+1
    # must land after p so that p's zero tail is overwritten by p+1's rows);
    # a fori_loop of start+wait beats P grid steps' fixed overhead ~5x.
    # Both endpoints 1D: 1D i32 HBM memrefs slice at 1024-element (64-row)
    # granularity, which the ghost alignment of base4 guarantees — asserted
    # to Mosaic via multiple_of (it cannot prove it from the data).
    def body(p, _):
        off = pl.multiple_of(base4_ref[p] * 16, 1024)
        cp = pltpu.make_async_copy(
            parts_ref.at[pl.ds(p * L, L)],
            out_ref.at[pl.ds(off, L)],
            sem,
        )
        cp.start()
        cp.wait()
        return 0

    jax.lax.fori_loop(0, plan.P, body, 0)


def _compact(plan: RadixPlan, parts, base4):
    """Ragged concat of per-partition row blocks at ghost-aligned offsets.
    Returns (n_ext + R_pad, 16) uint32 whose first sum(ceil64(valid)) rows
    are the bucket-contiguous sequence (zero ghost rows between partitions
    are exact identities for the scan)."""
    rows = plan.n_ext + plan.R_pad
    flat = pl.pallas_call(
        functools.partial(_compact_kernel, plan),
        grid=(1,),
        out_shape=jax.ShapeDtypeStruct((rows * 16,), jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(base4, parts.reshape(plan.P * plan.R_pad * 16))
    return flat.reshape(rows, 16)


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------

def radix_window(plan: RadixPlan, keys, pay):
    """One window's bucket-contiguous reorder.

    keys: (n,) int32 bucket ids in [0, 2^c); pay: (n, 16) uint32 packed
    payload (pack_payload; identity encoded as all-zero).

    Returns (sorted_pay, hi, spill_pay, spill_keys, overflow):
      sorted_pay (n_ext, 16) uint32 — valid points in bucket order (by key,
               then tile-major) with <= 63 zero ghost rows between coarse
               partitions; zero rows are identities
      hi       (2^c,) int32 — hi[b] = global position of bucket b's last row
               (bucket_bounds_hist's convention on this stream)
      spill_pay (n_tiles*SP, 16) uint32, spill_keys (n_tiles*SP,) int32 —
               spilled rows (all-zero = empty, key 0 -> never-queried bucket)
      overflow () bool — some tile exceeded SP: outputs unusable, caller
               must fall back to the exact sort+gather path
    """
    keys2 = keys.reshape(plan.n_tiles, 1, plan.T)
    tiles, cnt = _pass_a_call(plan, keys2, pay)
    cnt = cnt[:, 0, :plan.P]  # (n_tiles, P) valid-row coarse histogram

    slot_cnt = jnp.minimum(cnt, plan.S)
    spill_per_tile = cnt.sum(axis=1) - slot_cnt.sum(axis=1)
    overflow = jnp.any(spill_per_tile > plan.SP)

    main = (
        tiles[:, :plan.P * plan.S, :]
        .reshape(plan.n_tiles, plan.P, plan.S, 20)
        .transpose(1, 0, 2, 3)
        .reshape(plan.P, plan.R, 20)
    )
    pc_main = slot_cnt.sum(axis=0)  # (P,) valid rows entering each partition
    pc4 = ((pc_main + GHOST - 1) // GHOST) * GHOST  # ghost-aligned extents
    base4 = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pc4)[:-1].astype(jnp.int32)]
    )
    total4 = pc4.sum()
    parts, fc = _pass_b_call(plan, main)
    fc = fc[:, 0, :]
    sorted_rows = _compact(plan, parts, base4)[:plan.n_ext]
    # rows in [valid, total4) are zero ghosts / pass B tails; rows >= the
    # last DMA's end are UNWRITTEN — mask them so they read as identities
    live = jax.lax.broadcasted_iota(jnp.int32, (plan.n_ext, 1), 0) < total4
    sorted_pay = jnp.where(live, sorted_rows, 0)

    # hi[b=(p,f)] = base4[p] + (#valid rows in p with fine <= f) - 1
    nf = 1 << plan.fb
    within = jnp.cumsum(fc[:, :nf], axis=1).astype(jnp.int32)
    hi = (base4[:, None] + within - 1).reshape(-1)

    spill = tiles[:, plan.P * plan.S:plan.P * plan.S + plan.SP, :].reshape(
        -1, 20
    )
    spill_pay = spill[:, 0:16]
    spill_keys = spill[:, 16].astype(jnp.int32)
    return sorted_pay, hi, spill_pay, spill_keys, overflow
