from validate_spark.streaming.validate_stream import (
    validate_stream,
    violations_stream,
    windowed_violation_counts,
    foreach_batch_validator,
)
from validate_spark.streaming.stateful_dedup import stateful_drop_duplicates
from validate_spark.streaming.drift_stream import snapshot_histogram, windowed_drift

__all__ = [
    "validate_stream",
    "violations_stream",
    "windowed_violation_counts",
    "foreach_batch_validator",
    "stateful_drop_duplicates",
    "snapshot_histogram",
    "windowed_drift",
]
