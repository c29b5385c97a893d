"""Scalar/aggregate function surface (SURVEY.md §2.8) + training-data ops.

Everything here is pure Catalyst column expressions (whole-stage-codegen'd,
no Python in the hot path) unless a docstring says otherwise. Submodules:

- ``pedotransfer``: Maidment-92 / Saxton-2006 soil formulas, FAO texture class
  (reference ``libraries/pedotransfer.py``).
- ``metrics``: goodness-of-fit aggregates KGE/NSE/R2/RMSE/nRMSE/MAE
  (reference ``libraries/metrics.py``).
- ``upscaling``: block time-averaging (reference ``src/upscaling_tools.f90``).
- ``textstats``: token counting, quality scoring, language-ID heuristic,
  document fingerprinting (training-data pipeline surface).
- ``dedup``: exact / MinHash-LSH / SimHash / n-gram-Jaccard / embedding
  near-duplicate detection.
- ``similarity``: brute-force + LSH-bucketed cosine top-k ANN.
"""
