from . import (  # noqa: F401
    cluster,
    compact,
    dedup,
    expire,
    joins,
    merge,
    multimodal,
    optimize,
    repartition,
    rewrite,
    similarity,
    text,
)
