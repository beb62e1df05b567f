"""Debug-time sanity checks (the intent of the reference's default-on
`sanity-check` cargo feature, which gates nothing upstream — Cargo.toml:22-25,
SURVEY.md §5).  Enable with config.SANITY_CHECKS = True; checks run host-side
on fetched values and fail fast like the reference's assert!/panic! style."""

from __future__ import annotations

import numpy as np

from .. import config
from ..fields import CurveSpec
from ..ops.ec import EC, JPoint
from . import pyref


def enabled() -> bool:
    return getattr(config, "SANITY_CHECKS", False)


def check_on_curve(E: EC, pts: JPoint, what: str = "points") -> None:
    """All non-identity points satisfy the curve equation."""
    if not enabled():
        return
    for i, pt in enumerate(E.points_to_ints(pts)):
        if pt is not None:
            assert pyref.on_curve(pt, E.curve), f"{what}[{i}] off-curve"


def check_digit_range(digits, base: int) -> None:
    """All negbase digits lie in [0, base)."""
    if not enabled():
        return
    d = np.asarray(digits)
    assert ((d >= 0) & (d < base)).all(), "digit out of range"
