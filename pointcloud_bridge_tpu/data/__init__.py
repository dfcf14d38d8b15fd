"""Data layer (L0 file IO + L1 block samplers)."""
