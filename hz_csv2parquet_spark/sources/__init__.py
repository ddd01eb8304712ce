from .io import add_suffix_to_path, convert, read_table, write_table

__all__ = ["read_table", "write_table", "convert", "add_suffix_to_path"]
