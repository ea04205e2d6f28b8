from . import (  # noqa: F401
    asof,
    curation,
    dedup,
    graph,
    multimodal,
    pipeline,
    relational,
    similarity,
    textops,
)
