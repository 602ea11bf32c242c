from .store import (open_dataset, write_table, read_table, storage_format,
                    export_frontier, load_frontier, frontier_rows_to_table,
                    table_to_frontier_rows)

__all__ = ["open_dataset", "write_table", "read_table", "storage_format",
           "export_frontier", "load_frontier", "frontier_rows_to_table",
           "table_to_frontier_rows"]
