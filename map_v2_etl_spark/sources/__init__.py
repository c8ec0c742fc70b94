from .registry import load_table, load_tables  # noqa: F401
from .csv_io import read_long_csv, write_sorted_csv  # noqa: F401
