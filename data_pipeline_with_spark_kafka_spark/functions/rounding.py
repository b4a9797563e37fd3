"""Cross-engine-stable rounding for double outputs.

Spark's ``F.round`` converts the full double to BigDecimal and rounds
HALF_UP at the target scale; DuckDB rounds ``std::round(x * 10^d) / 10^d``
on the scaled PRODUCT. For doubles sitting within one ulp of a .5
boundary these disagree (observed: 2/500 rows of a [0,1] score at scale
4). ``round_to`` reproduces the scaled-product algorithm in Spark — both
engines then round the *same* product double with the same
half-away-from-zero rule, giving bit-identical results.

Use for any double that leaves a query; plain ``F.round`` remains fine
for sort keys that are also emitted (both sides must just agree).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_to(col: Column | str, scale: int = 4) -> Column:
    """DuckDB-compatible double rounding: round(col * 10^scale) / 10^scale."""
    if isinstance(col, str):
        col = F.col(col)
    factor = F.lit(float(10**scale))
    return F.round(col * factor, 0) / factor
