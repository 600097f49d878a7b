from . import compact, cluster, expire, merge, repartition, rewrite  # noqa: F401
