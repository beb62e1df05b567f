"""MXU radix-shuffle point reordering for the Pippenger MSM.

Replaces the per-window sorted-point gather — measured 33.3 ms of a 53.3 ms
window at n = 2^20 on TPU v5e (62% of window time; XLA:TPU gathers cost ~22
cycles PER INDEX regardless of access pattern) — with one-hot matmul
permutations on the MXU plus slot-granular data movement, per
docs/DESIGN-mxu-gather.md.  This is the TPU answer to the data-dependent
scatter the reference gets for free on CPU inside `best_multiexp`
(/root/reference/src/argument_witness_calc.rs:144, halo2 fork arithmetic):
there is no per-lane scatter unit, but the MXU can apply a permutation as a
one-hot matrix multiply exactly.

Pipeline (per c-bit window, key = bucket id, split c = cb coarse | fb fine):

  pass A (pallas, grid over tiles of T rows):
    - coarse id ranks + histogram via one-hot columns and a log-shift cumsum
    - identity input points (x = y = 0) are DROPPED (they contribute nothing
      to any bucket; dropping keeps slot-count bookkeeping exact)
    - permute the (x || y) payload, with the window key packed into the high
      bytes of limb column 0, into a coarse-sorted slot-padded tile image
      [P partitions x S rows] via (strip x T) @ (T x 128) bf16 one-hot
      matmuls over byte planes — exact, since planes are < 256
    - rows whose within-(tile, partition) rank exceeds S spill to a per-tile
      side region of SP rows (handled exactly by the classic sort+gather
      path at ~2-3% scale); SP overflow raises a flag -> full fallback
  XLA glue: transpose the (tile, partition) slot grid to partition-major —
    contiguous (S x 128B) chunks, runs at memcpy speed, and THIS is what
    makes the global regroup free: no per-run DMAs, no row gathers.
  pass B (pallas, grid over P partitions):
    - row validity is content-based (all-zero row <=> empty slot / dropped
      identity), so no slot-count streaming is needed
    - stable counting sort by fine id + compaction via a second one-hot
      matmul; invalid rows sort to the tail as zeros
    - DMA the partition's R_pad rows to the global output at base[p]
      (scalar-prefetched): TPU pallas grids execute SEQUENTIALLY, so
      partition p+1's write overwrites partition p's padded tail garbage —
      the output's first sum(valid) rows are exactly the bucket-contiguous
      point sequence
    - per-fine counts out -> bucket boundaries `hi` (same convention as
      ops/msm.bucket_bounds_hist: hi[b] = (#valid rows with key <= b) - 1)

Mosaic hazards pinned down on real v5e by tools/probe_radix.py:
  * byte reassembly MUST be multiply-add (b0 + 256*b1 + 65536*b2 + ...),
    never left-shifts of lane-sliced tensors (those mis-lower and zero
    bytes < 128); b3 < 128 in our payloads so int32 never overflows
  * jnp.cumsum has no TPU lowering — log-shift cumsum via pltpu.roll
  * f32 -> uint32 casts are unsupported — go through int32
  * int8 MXU matmuls mis-pack RHS planes beyond lane 32 — use bf16
"""

from __future__ import annotations

import functools
import math
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
    R_pad: int        # R padded to SHB
    SHB: int          # pass B output strip height
    FB_COLS: int      # lanes holding fine columns (>= 2^fb + 1, mult of 128)


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
    S = mean + max(4, mean // 2)
    SP = max(128, T // 32)
    raw = P * S + SP
    SH = 256 if raw >= 256 else raw
    OUT_ROWS = _cdiv(raw, SH) * SH
    R = n_tiles * S
    SHB = 256 if R >= 256 else R
    R_pad = _cdiv(R, SHB) * SHB
    FB_COLS = _cdiv((1 << fb) + 1, 128) * 128
    return RadixPlan(n, c, T, n_tiles, cb, fb, P, S, SP, OUT_ROWS, SH,
                     R, R_pad, SHB, FB_COLS)


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------

def _cumsum_rows(x):
    """Inclusive cumsum along axis 0 (sublanes) — log-shift via pltpu.roll
    (jnp.cumsum has no Mosaic lowering)."""
    nr = x.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    d = 1
    while d < nr:
        sh = pltpu.roll(x, shift=d, axis=0)
        x = x + jnp.where(rows < d, 0.0, sh)
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


def _planes_bf16(pay):
    """(T, 32) uint32 payload -> (T, 128) bf16 byte planes
    [b0 x32 | b1 x32 | b2 x32 | b3 x32]; full-tensor shifts only."""
    ps = [((pay >> (8 * k)) & 0xFF).astype(jnp.int32) for k in range(4)]
    return jnp.concatenate(ps, axis=1).astype(jnp.bfloat16)


def _permute_strips(dst, planesb, out_rows, strip, write):
    """Apply the permutation src -> dst[src] with one-hot matmuls per output
    strip; write(strip_idx, (strip, 32) uint32 rows).  Rows with no source
    come out all-zero."""
    T = dst.shape[0]
    dd0 = jax.lax.broadcasted_iota(jnp.int32, (strip, 1), 0)
    for k in range(out_rows // strip):
        oh = ((dd0 + k * strip) == dst[None, :]).astype(jnp.bfloat16)  # (strip, T)
        acc = jax.lax.dot_general(
            oh, planesb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (strip, 128) exact byte values
        b = acc.astype(jnp.int32)
        rows = (b[:, 0:32] + b[:, 32:64] * 256 + b[:, 64:96] * 65536
                + b[:, 96:128] * 16777216).astype(jnp.uint32)
        write(k, rows)


# ---------------------------------------------------------------------------
# pass A
# ---------------------------------------------------------------------------

def _rank_kernel(plan: RadixPlan, keys_ref, pay_ref, dst_ref, cnt_ref):
    """Per tile: within-(tile, partition) ranks -> one-hot destinations."""
    T, P, S = plan.T, plan.P, plan.S
    kv = keys_ref[0, 0, :]  # (T,) int32 window keys in [0, 2^c)
    pay = pay_ref[:]        # (T, 32) uint32: x limbs 0..15 | y limbs 0..15
    coarse = kv >> plan.fb

    # identity inputs (x = y = 0 rows) are dropped
    valid = jnp.sum((pay != 0).astype(jnp.int32), axis=1) > 0  # (T,)

    # ranks within (tile, coarse partition) + per-partition counts
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


def _shuffle_kernel(plan: RadixPlan, keys_ref, dst_ref, pay_ref, out_ref):
    """Per tile: permute payload into the slot-padded coarse image."""
    kv = keys_ref[0, 0, :]
    dst = dst_ref[0, 0, :]
    pay = pay_ref[:]

    # byte planes with the window key packed into col 0's high bytes
    # (overrides applied in int32: Mosaic can't minor-dim-reshape bf16)
    ps = [((pay >> (8 * k)) & 0xFF).astype(jnp.int32) for k in range(4)]
    planes = jnp.concatenate(ps, axis=1)  # (T, 128) int32
    lane = jax.lax.broadcasted_iota(jnp.int32, (plan.T, 128), 1)
    planes = jnp.where(lane == 64, (kv & 0xFF)[:, None], planes)
    planes = jnp.where(lane == 96, (kv >> 8)[:, None], planes)
    planesb = planes.astype(jnp.bfloat16)

    def write(k, rows):
        out_ref[0, pl.ds(k * plan.SH, plan.SH), :] = rows

    _permute_strips(dst, planesb, plan.OUT_ROWS, plan.SH, write)


def _pass_a_call(plan: RadixPlan, keys2, pay):
    """keys2 (n_tiles, 1, T) int32; pay (n, 32) uint32 ->
    (tiles (n_tiles, OUT_ROWS, 32) uint32, counts (n_tiles, 1, P_COLS) int32).

    Two kernels (ranks, then shuffle) with the (n,) dst vector round-tripping
    HBM: each kernel's VMEM working set fits the 16 MB scoped limit, and the
    4 MB of extra traffic is noise next to the payload streams."""
    p_cols = max(128, plan.P)
    key_spec = pl.BlockSpec((1, 1, plan.T), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    pay_spec = pl.BlockSpec((plan.T, 32), lambda i: (i, 0),
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
    tiles = pl.pallas_call(
        functools.partial(_shuffle_kernel, plan),
        grid=(plan.n_tiles,),
        out_shape=jax.ShapeDtypeStruct(
            (plan.n_tiles, plan.OUT_ROWS, 32), jnp.uint32
        ),
        in_specs=[key_spec,
                  pl.BlockSpec((1, 1, plan.T), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pay_spec],
        out_specs=pl.BlockSpec((1, plan.OUT_ROWS, 32), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(keys2, dst, pay)
    return tiles, cnt


# ---------------------------------------------------------------------------
# pass B
# ---------------------------------------------------------------------------

def _pass_b_kernel(plan: RadixPlan, main_ref, out_ref, fc_ref):
    R, fb = plan.R, plan.fb
    nfine = 1 << fb
    rows = main_ref[0]  # (R, 32) uint32
    # full-tensor shift first, lane-slice after (Mosaic hazard otherwise)
    keyp = (rows >> 16).astype(jnp.int32)
    key = keyp[:, 0]  # 15-bit window key (b2 | b3 of col 0)
    valid = jnp.sum((rows != 0).astype(jnp.int32), axis=1) > 0
    fine = jnp.where(valid, key & (nfine - 1), nfine)

    # stable counting sort by fine id (sentinel nfine = invalid -> tail)
    fcols = plan.FB_COLS
    assert fcols == 128, "fb > 6 would need strip loops here"
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    oh = (fine[:, None] == cols).astype(jnp.float32)
    csum = _cumsum_rows(oh)
    fcnt = csum[R - 1, :]  # (128,) per-fine counts (col nfine = invalid)
    rank = jnp.sum((csum - oh) * oh, axis=1)
    fbase = _cumsum_lanes_excl(fcnt[None, :])  # (1, 128) exclusive
    base_at = jnp.sum(fbase * oh, axis=1)
    dst = (base_at + rank).astype(jnp.int32)

    planesb = _planes_bf16(rows)

    def write(k, out_rows):
        out_ref[0, pl.ds(k * plan.SHB, plan.SHB), :] = out_rows

    _permute_strips(dst, planesb, plan.R_pad, plan.SHB, write)
    fc_ref[0, 0, :] = fcnt.astype(jnp.int32)


def _pass_b_call(plan: RadixPlan, main):
    """main (P, R, 32) uint32 -> (parts (P, R_pad, 32) uint32 [valid rows
    fine-sorted first, zero tail], fine counts (P, 1, FB_COLS) int32)."""
    kern = functools.partial(_pass_b_kernel, plan)
    return pl.pallas_call(
        kern,
        grid=(plan.P,),
        out_shape=(
            jax.ShapeDtypeStruct((plan.P, plan.R_pad, 32), jnp.uint32),
            jax.ShapeDtypeStruct((plan.P, 1, plan.FB_COLS), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((1, plan.R, 32), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, plan.R_pad, 32), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, plan.FB_COLS), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(main)


def _compact(plan: RadixPlan, parts, base):
    """Ragged concat: copy each partition's R_pad rows to its global base
    offset with in-place dynamic_update_slice, ascending p — partition p+1's
    rows overwrite p's zero-padded tail, leaving the first sum(valid) rows
    bucket-contiguous."""
    buf = jnp.zeros((plan.n + plan.R_pad, 32), jnp.uint32)

    def body(p, b):
        return jax.lax.dynamic_update_slice(b, parts[p], (base[p], 0))

    return jax.lax.fori_loop(0, plan.P, body, buf)


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------

def radix_window(plan: RadixPlan, keys, pay):
    """One window's bucket-contiguous reorder.

    keys: (n,) int32 bucket ids in [0, 2^c); pay: (n, 32) uint32 (x || y)
    affine Montgomery limb rows (identity encoded as all-zero).

    Returns (sx, sy, hi, spill_rows, overflow):
      sx, sy   (n, 16) uint32 — valid points in bucket order (by key, then
               tile-major), zero rows (= identity) past the valid count
      hi       (2^c,) int32 — hi[b] = (#valid main rows with key <= b) - 1,
               exactly bucket_bounds_hist's convention over the main rows
      spill_rows (n_tiles*SP, 32) uint32 — spilled rows, key in col 0's high
               bytes, all-zero = empty
      overflow () bool — some tile exceeded SP: outputs unusable, caller
               must fall back to the exact sort+gather path
    """
    n = plan.n
    keys2 = keys.reshape(plan.n_tiles, 1, plan.T)
    tiles, cnt = _pass_a_call(plan, keys2, pay)
    cnt = cnt[:, 0, :plan.P]  # (n_tiles, P) valid-row coarse histogram

    slot_cnt = jnp.minimum(cnt, plan.S)
    spill_per_tile = cnt.sum(axis=1) - slot_cnt.sum(axis=1)
    overflow = jnp.any(spill_per_tile > plan.SP)

    main = (
        tiles[:, :plan.P * plan.S, :]
        .reshape(plan.n_tiles, plan.P, plan.S, 32)
        .transpose(1, 0, 2, 3)
        .reshape(plan.P, plan.R, 32)
    )
    pc_main = slot_cnt.sum(axis=0)  # (P,) rows entering each partition
    base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pc_main)[:-1].astype(jnp.int32)]
    )
    parts, fc = _pass_b_call(plan, main)
    fc = fc[:, 0, :]
    sorted_rows = _compact(plan, parts, base)[:n]
    # rows past the compacted valid prefix are zero (zero-init + zero pass B
    # tails) = exact identities (y = 0) for the downstream scan
    sx = sorted_rows[:, :16]
    sy = sorted_rows[:, 16:]
    sx = sx.at[:, 0].set(sx[:, 0] & 0xFFFF)  # strip packed key bits

    hi = jnp.cumsum(fc[:, :1 << plan.fb].reshape(-1)).astype(jnp.int32) - 1

    spill_rows = tiles[:, plan.P * plan.S:plan.P * plan.S + plan.SP, :].reshape(
        -1, 32
    )
    return sx, sy, hi, spill_rows, overflow


def split_spill(spill_rows):
    """(M, 32) spill rows -> (keys (M,) int32, sx, sy (M, 16) uint32).
    Empty rows give key 0 + identity (y = 0) — bucket 0 is never queried."""
    keys = (spill_rows[:, 0] >> 16).astype(jnp.int32)
    sx = spill_rows[:, :16].at[:, 0].set(spill_rows[:, 0] & 0xFFFF)
    sy = spill_rows[:, 16:]
    return keys, sx, sy
