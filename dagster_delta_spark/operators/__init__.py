from . import (  # noqa: F401
    asof,
    bpe,
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
