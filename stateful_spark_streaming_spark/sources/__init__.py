from stateful_spark_streaming_spark.sources.tables import load_table, register_views  # noqa: F401
from stateful_spark_streaming_spark.sources.flights import (  # noqa: F401
    parse_flight_lines,
    read_flight_csv,
)
