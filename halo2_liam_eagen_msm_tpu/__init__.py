"""halo2_liam_eagen_msm_tpu — a TPU-native framework implementing the
capabilities of the `halo2-liam-eagen-msm` reference crate (Liam Eagen's MSM
argument witness pipeline, https://eprint.iacr.org/2022/596 pp. 8-9):

  * fixed-limb Montgomery field arithmetic and Jacobian curve ops as batched
    JAX/Pallas kernels (ops/ff.py, ops/ec.py)
  * NTT polynomial algebra with precomputed twiddle tables (ops/ntt.py, ops/poly.py)
  * Pippenger best_multiexp (ops/msm.py)
  * regular-function divisor witnesses via a level-synchronous batched merge
    tree (divisor.py)
  * negbase scalar decomposition and circuit-witness prep (negbase.py)
  * the full argument witness orchestration (argument.py)
  * the halo2 circuit layer as a constraint-data generator + out-of-circuit
    checker (circuit/)
  * mesh sharding for multi-chip/multi-host runs (parallel/)
  * a bit-exact C++ CPU oracle (oracle/, native/)

Primary curve cycle: Pallas/Vesta; Grumpkin/BN254 retained for cross-checks
against the reference's frozen constants.
"""

from . import fields, limbs

__version__ = "0.1.0"
