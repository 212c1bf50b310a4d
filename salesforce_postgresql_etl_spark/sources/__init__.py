from .tables import TABLES, load, load_all, register_views, run_sql  # noqa: F401
