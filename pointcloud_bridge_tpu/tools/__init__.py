"""CLI tools (L0): LAS<->H5 conversion, relabeling, voxel downsampling,
dataset splitting, model smoke tests (SURVEY.md §2.8)."""
