from . import (  # noqa: F401
    asof,
    curation,
    dedup,
    graph,
    incremental,
    multimodal,
    pipeline,
    relational,
    similarity,
    textops,
)
