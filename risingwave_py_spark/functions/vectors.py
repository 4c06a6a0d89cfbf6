"""Vector similarity operators. Filled in M6."""
