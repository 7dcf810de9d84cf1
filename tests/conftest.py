import pytest

from validate_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="validate_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


def rows_to_set(df, cols=None):
    """Order-insensitive row comparison helper."""
    if cols:
        df = df.select(*cols)
    return {tuple(r) for r in df.collect()}
