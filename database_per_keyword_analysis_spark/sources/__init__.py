from .loader import SCHEMAS, TABLES, fan_out, load, register_views  # noqa: F401
