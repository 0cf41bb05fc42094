from .tables import load_table, load_tables, spread

__all__ = ["load_table", "load_tables", "spread"]
