"""The flagship 'model': the Liam Eagen MSM argument witness pipeline,
packaged as a configured, jittable unit.

This plays the role an ML framework's model class would: a config (curve,
base, point count), a device-side forward step (digit rounds -> witness
polynomials + carry), and host-side pre/post-processing (scalar decomposition,
canonical extraction).  Reference entry point: compute_lhs_witness
(/root/reference/src/argument_witness_calc.rs:87)."""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import argument as A
from ..divisor import RF, Level, merge_level, seeds
from ..fields import CurveSpec, PALLAS, N_LIMBS
from ..limbs import ints_to_limbs
from ..negbase import negbase_decompose_batch
from ..ops.ec import JPoint, ec


@dataclasses.dataclass(frozen=True)
class EagenConfig:
    curve: CurveSpec = PALLAS
    base: int = 5
    num_pts: int = 8

    @property
    def num_digits(self) -> int:
        return A.num_digits_for(self.curve, self.base)

    @property
    def slots(self) -> int:
        """Points per digit round: base carry slots + one per input + closer."""
        return self.base + self.num_pts + 1


class EagenMSMWitness:
    """End-to-end witness computer for a fixed configuration."""

    def __init__(self, cfg: EagenConfig):
        self.cfg = cfg
        self.E = ec(cfg.curve)

    # ---------------------------------------------------------------- host IO
    def decompose(self, scalars) -> np.ndarray:
        """Host: scalars -> (d, N) int32 msb-first digit rounds."""
        d = self.cfg.num_digits
        digits = negbase_decompose_batch(
            ints_to_limbs(scalars), self.cfg.base, d
        )
        return digits[:, ::-1].T.astype(np.int32)

    # ------------------------------------------------------------ device step
    def forward(self, digits, pts: JPoint):
        """Jittable forward: digit rounds + points -> (carry, witness RF).
        One traced graph: round assembly, carry scan, seeds, all merge levels."""
        return _forward_jit(self.cfg, digits, pts)

    def __call__(self, scalars, pts: JPoint):
        digits = jnp.asarray(self.decompose(scalars))
        return self.forward(digits, pts)


@partial(jax.jit, static_argnums=(0,))
def _forward_jit(cfg: EagenConfig, digits, pts: JPoint):
    curve = cfg.curve
    round_pts, carry = A._rounds_and_carries(curve, cfg.base, digits, pts)
    n = round_pts.x.shape[-2]
    if n % 2:
        E = ec(curve)
        idp = E.identity(round_pts.x.shape[:-2] + (1,))
        round_pts = JPoint(
            jnp.concatenate([round_pts.x, idp.x], axis=-2),
            jnp.concatenate([round_pts.y, idp.y], axis=-2),
            jnp.concatenate([round_pts.z, idp.z], axis=-2),
        )
    lv = seeds(curve, round_pts)
    b_sem = 1
    # same level engine as compute_divisor_witness_partial (divisor.py) —
    # no consts operands here: _forward_jit is the compile-check/model path
    # at small num_pts (the streamed argument path handles production sizes)
    while lv.out.x.shape[-2] > 1:
        b_sem *= 2
        lv = merge_level(curve, b_sem + 1, b_sem, lv)
    wtns = RF(lv.wtns.a[..., 0, :, :], lv.wtns.b[..., 0, :, :])
    # reference round order: LSB digit first (:132)
    wtns = RF(wtns.a[::-1], wtns.b[::-1])
    return carry, wtns
