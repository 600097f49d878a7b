from . import lineage, manifest, metastore  # noqa: F401
