"""Dataset sources & sinks: parquet pages/records, WARC/WET segments."""

from .readers import (
    generate_pages,
    generate_records,
    read_pages,
    read_parquet_evolved,
    read_records,
)
from .warc import read_warc, read_wet, write_warc, write_wet

__all__ = [
    "generate_pages",
    "generate_records",
    "read_pages",
    "read_parquet_evolved",
    "read_records",
    "read_warc",
    "read_wet",
    "write_warc",
    "write_wet",
]
