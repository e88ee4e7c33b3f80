from .loader import SCHEMAS, TABLES, load, register_views  # noqa: F401
