"""Measured-negative Pallas TPU kernel experiments (SURVEY.md §2.3).

Every module here is a *tested, documented negative result*: a fused Pallas
kernel that was built for a hot op, measured on the real v5e chip, and lost
to (or only tied) the shipping XLA composition at the scale that matters.
They are kept — off by default, exercised by interpret-mode tests — so the
numbers and the closed avenues stay reproducible, but they are NOT on the
default import path (render/ and ops/ import them only behind their opt-in
flags).

Index of what was tried and why it lost: docs/PERF.md.

  dparf.py          fused kNN+aggregate DPaRF v1 (Mosaic cross-lane argmin)
  dparf2.py         transposed-tile DPaRF v2 (points-in-lanes, bit-packed
                    min+argmin) — recovered v1's loss, still no win
  cull.py           fused min-dist SMPL cull — on par with XLA's blocked scan
  streamscatter.py  windowed streaming scatter for the sampling backward —
                    wins isolated, loses inside the full train step
"""
