"""Global backend configuration.

use_pallas(): whether the hot field/EC ops route through the Pallas TPU
kernels (ops/pallas_ff.py) instead of the portable jnp limb path.  Auto mode
enables them on any non-CPU backend; CPU tests keep the jnp path (which is
also the semantic reference for the kernels)."""

from __future__ import annotations

import jax

_USE_PALLAS: bool | None = None  # None = auto
# Minimum flattened batch for kernel routing.  One padded block (1024 lanes)
# of wasted compute is still far cheaper than compiling/running the jnp limb
# graph on TPU-class backends, so route everything once pallas is on.
PALLAS_MIN_BATCH = 1


def set_use_pallas(v: bool | None) -> None:
    global _USE_PALLAS
    _USE_PALLAS = v


# Debug-time sanity checks (on-curve, digit ranges) — the intent of the
# reference's dormant `sanity-check` cargo feature; see utils/checks.py
SANITY_CHECKS = False

# Route large-window MSM reorders through the MXU radix shuffle
# (ops/radix.py) instead of sort+gather.  Wired, bit-exact, and covered by
# tests/tools (tests/test_radix.py, tools/ab_radix_msm.py,
# tools/profile_radix_msm.py) but DEFAULT OFF: measured on v5e at 2^20 the
# radix window is ~1.6x the classic window (A/B 2026-08-21: radix 1.43s vs
# classic 0.69s full MSM; radix_window alone 151ms vs sort+gather+hist
# 100ms) — the one-hot matmuls + transpose + compact cost more than the
# 64B-row gather they replace on this XLA/Mosaic stack.  See
# docs/DESIGN-mxu-gather.md "Measured outcome".
RADIX_MSM = False


def use_radix_msm() -> bool:
    return RADIX_MSM


# Limb-major pallas-NTT merge tail (divisor._merge_tail_fused_lm): keeps
# the fused merge's transforms/pointwise algebra in (16, nb, 8, 128) layout
# with fused butterfly kernels — ~3x fewer HBM passes per stage than the
# per-op pallas path (see docs/DESIGN-ntt-passes.md).  None = follow
# use_pallas().
_LM_MERGE: bool | None = None


def set_lm_merge(v: bool | None) -> None:
    global _LM_MERGE
    _LM_MERGE = v


def use_lm_merge() -> bool:
    if _LM_MERGE is not None:
        return _LM_MERGE
    return use_pallas()


def use_pallas() -> bool:
    if _USE_PALLAS is not None:
        return _USE_PALLAS
    return jax.default_backend() != "cpu"
