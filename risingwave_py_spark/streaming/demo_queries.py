"""Streaming/MV demo queries exposed to the driver. Filled in M2/M3."""
