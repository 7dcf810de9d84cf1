from validate_spark.streaming.validate_stream import (
    validate_stream,
    violations_stream,
    windowed_violation_counts,
    foreach_batch_validator,
)

__all__ = [
    "validate_stream",
    "violations_stream",
    "windowed_violation_counts",
    "foreach_batch_validator",
]
