"""Multimodal (binary) column operators. Filled in M6."""
