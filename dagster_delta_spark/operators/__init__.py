from . import (  # noqa: F401
    asof,
    curation,
    dedup,
    fuzzy,
    graph,
    incremental,
    multimodal,
    pipeline,
    relational,
    similarity,
    textops,
)
