"""Scene catalog: the engine's Archive analog over Parquet-backed Datasets."""
