from validate_spark.streaming.validate_stream import (
    validate_stream,
    violations_stream,
    windowed_violation_counts,
    foreach_batch_validator,
)
from validate_spark.streaming.stateful_dedup import stateful_drop_duplicates

__all__ = [
    "validate_stream",
    "violations_stream",
    "windowed_violation_counts",
    "foreach_batch_validator",
    "stateful_drop_duplicates",
]
