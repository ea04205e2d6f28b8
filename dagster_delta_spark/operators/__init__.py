from . import (  # noqa: F401
    asof,
    curation,
    dedup,
    multimodal,
    pipeline,
    relational,
    similarity,
    textops,
)
