from . import flagship, query_defs  # noqa: F401
