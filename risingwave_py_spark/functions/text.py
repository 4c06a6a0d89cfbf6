"""Text analysis operators. Filled in M6."""
