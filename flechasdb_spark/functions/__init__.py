from flechasdb_spark.functions.linalg import (  # noqa: F401
    add,
    cosine_similarity,
    dot,
    max_abs,
    norm2,
    normalize,
    scale,
    slice_division,
    squared_l2,
    subtract,
    vmin,
    vsum,
)
