from .relational import (
    between_filter,
    derive,
    drop_columns,
    flag,
    project,
)
from .aggregates import (
    count_by,
    grouped_agg,
    melt_feature_means,
    sum_flag_split,
)

__all__ = [
    "between_filter",
    "count_by",
    "derive",
    "drop_columns",
    "flag",
    "grouped_agg",
    "melt_feature_means",
    "project",
    "sum_flag_split",
]
