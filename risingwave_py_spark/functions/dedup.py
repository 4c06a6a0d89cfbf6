"""Deduplication operators (exact + near-dup). Filled in M6."""
