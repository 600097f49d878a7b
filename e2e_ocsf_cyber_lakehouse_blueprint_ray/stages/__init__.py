from . import (  # noqa: F401
    cluster,
    compact,
    dedup,
    expire,
    merge,
    multimodal,
    optimize,
    repartition,
    rewrite,
    similarity,
    text,
)
