"""Cross-cutting utilities: metrics, logging, checkpointing, profiling (L6)."""
