from .tpch import load_table, register_views  # noqa: F401
