from . import (  # noqa: F401
    cluster,
    compact,
    dedup,
    expire,
    merge,
    multimodal,
    repartition,
    rewrite,
    similarity,
    text,
)
