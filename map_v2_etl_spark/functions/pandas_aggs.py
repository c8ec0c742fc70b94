"""GROUPED_AGG pandas UDFs — Arrow-batched per-group numpy reductions.

NOTE: deliberately NO ``from __future__ import annotations`` here —
pandas_udf infers the UDF eval type from the REAL annotation objects
(pd.Series -> scalar ⇒ grouped aggregation); postponed evaluation turns
them into strings and breaks the inference.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geomean(v: pd.Series) -> float:
    """Geometric mean of a positive series: exp(mean(log x)) in one
    vectorized reduction per group."""
    return float(np.exp(np.log(v.to_numpy()).mean()))
