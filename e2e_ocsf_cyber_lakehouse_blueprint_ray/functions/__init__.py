from . import meta, ocsf, variant  # noqa: F401
