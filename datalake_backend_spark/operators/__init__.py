"""Distributed operator library.

Every analytical computation the reference performs on the driver after
``collect()`` (SURVEY §2.6 A10-A15 and §2.7 W1-W9) re-expressed as
native DataFrame transforms: hash aggregates, window functions, and
running-sum sessionization. All operators shuffle at most once on their
natural key and stay inside whole-stage codegen.
"""

from datalake_backend_spark.operators.mode import mode_agg
from datalake_backend_spark.operators.sessionize import sessionize
from datalake_backend_spark.operators.renest import renest_frames

__all__ = ["mode_agg", "sessionize", "renest_frames"]
