from .io import SCHEMAS, TABLES, load, load_all, load_raw, path  # noqa: F401
