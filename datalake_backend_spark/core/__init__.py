"""Core column-level transforms: cleaning kernel + geometry helpers."""
