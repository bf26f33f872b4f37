from . import dedup, filter_expr, ivf, knn, mutation  # noqa: F401
