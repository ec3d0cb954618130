"""Sources: table loaders and deterministic synthetic generators."""
