from mini_log_lakehouse_spark.sources.registry import TABLES, load_table, register_views
from mini_log_lakehouse_spark.sources.logs import (
    LOG_REGEX,
    read_raw_lines,
    parse_logs,
    write_bronze,
    read_bronze,
)

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "LOG_REGEX",
    "read_raw_lines",
    "parse_logs",
    "write_bronze",
    "read_bronze",
]
