"""End-to-end pipelines over the driver's parquet tables."""
