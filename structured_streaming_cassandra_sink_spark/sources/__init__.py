from .formats import read_csv, read_jsonl, write_csv, write_jsonl
from .tables import load_table, load_tables, spread

__all__ = [
    "load_table",
    "load_tables",
    "spread",
    "read_csv",
    "read_jsonl",
    "write_csv",
    "write_jsonl",
]
