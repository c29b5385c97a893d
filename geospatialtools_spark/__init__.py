"""geospatialtools_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the semantics of chaneyn/geospatialtools (reference snapshot at
/root/reference, a serial Fortran/GDAL raster pipeline) as idiomatic Spark:

- rasters become long-form cell DataFrames partitioned into (tile_i, tile_j)
  blocks, stencils run per-tile with halo exchange inside Arrow-batched
  ``applyInPandas`` (see ``operators/stencil.py``);
- the D8 flow-direction graph becomes an edge DataFrame; downstream traversals
  (basins, HAND) are pointer-doubling joins, O(log path) shuffle rounds;
- point sampling / rasterization / PIP joins become cell-indexed equi-joins
  (``cellindex.py`` provides the hierarchical quad-cell index used the way the
  reference would use H3/S2) with exact geometry tests in vectorized numpy;
- zone property tables become plain groupBy aggregations.

Golden parity: ``oracle/`` contains pure-numpy line-by-line ports of the
reference kernels (cited file:line in each docstring); Spark operators are
tested bit-for-bit against them on deterministic synthetic DEMs.
"""

__version__ = "0.1.0"
