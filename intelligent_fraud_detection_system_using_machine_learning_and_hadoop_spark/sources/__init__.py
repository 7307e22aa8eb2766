from .readers import read_claims_csv, read_table, load_testdata
from .writers import write_csv_single, write_parquet

__all__ = [
    "read_claims_csv",
    "read_table",
    "load_testdata",
    "write_csv_single",
    "write_parquet",
]
