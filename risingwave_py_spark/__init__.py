"""risingwave_py_spark — a PySpark-native engine with the query and
data-processing capabilities of risingwavelabs/risingwave-py.

Public API parity with /root/reference/risingwave/__init__.py:1-3.
"""

from risingwave_py_spark.core import (
    MaterializedView,
    OutputFormat,
    RisingWave,
    RisingWaveConnection,
    RisingWaveConnOptions,
    Subscription,
)

__all__ = [
    "RisingWave",
    "RisingWaveConnection",
    "RisingWaveConnOptions",
    "MaterializedView",
    "Subscription",
    "OutputFormat",
]
__version__ = "0.1.0"
