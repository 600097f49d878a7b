from . import medallion  # noqa: F401
