from .tables import TABLE_NAMES, load_table, load_all, register_temp_views

__all__ = ["TABLE_NAMES", "load_table", "load_all", "register_temp_views"]
