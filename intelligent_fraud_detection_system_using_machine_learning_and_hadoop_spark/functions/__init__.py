from .exprs import (
    assemble_flags,
    combine_fraud,
    days_since,
    exact_percentile,
    approx_percentile,
    flag_when,
)

__all__ = [
    "assemble_flags",
    "combine_fraud",
    "days_since",
    "exact_percentile",
    "approx_percentile",
    "flag_when",
]
