"""Sources & sinks (SURVEY.md §2.1 S1-S10).

The reference's GeoTIFF/NetCDF/pickle IO becomes parquet cell tables with
sidecar metadata — partitioned so Catalyst/Iceberg statistics prune reads
(S3's windowed read is a WHERE clause, not an API)."""
