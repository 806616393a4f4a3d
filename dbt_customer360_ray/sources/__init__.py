from .readers import read_table  # noqa: F401
