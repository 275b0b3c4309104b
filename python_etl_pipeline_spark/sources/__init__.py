"""Sources & sinks (SURVEY.md §2.1)."""

from .csv import read_csv_all_string
from .ingest_log import IngestLog
from .warehouse import Warehouse

__all__ = ["read_csv_all_string", "IngestLog", "Warehouse"]
