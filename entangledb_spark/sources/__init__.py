"""Table sources: parquet registry, snapshot-versioned storage, catalog."""
