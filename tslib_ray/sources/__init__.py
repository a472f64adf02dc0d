"""Dataset sources: parquet readers with column pruning, deterministic
synthetic transcript generation, and the events->transcripts derivation."""
