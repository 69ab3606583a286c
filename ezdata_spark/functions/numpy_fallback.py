"""Arrow pandas_udf fallback for unmapped numpy functions.

The reference's expression engine exposes the whole numpy namespace
(simpletable.py:2745). Our translator maps the common names to Spark SQL
builtins (JVM-side, codegen'd); anything else lands here: a vectorized
Arrow-batched pandas_udf named ``ez_np_<fn>``. Registration is lazy and
per-session — only the names an expression actually uses get registered,
so the common path never touches Python.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

def ensure_numpy_fallbacks(spark: SparkSession, names: set[str]) -> None:
    """Register ``ez_np_<name>`` pandas_udfs for each numpy function name.

    The done-set rides on the session object itself (NOT a dict keyed by
    ``id(spark)``, which a later session can collide with after GC), and
    a name is marked done only after successful registration.
    """
    done: set[str] = getattr(spark, "_ez_np_registered", None)
    if done is None:
        done = set()
        spark._ez_np_registered = done  # type: ignore[attr-defined]
    for name in names:
        if name in done:
            continue
        fn = getattr(np, name, None)
        if fn is None or not callable(fn):
            raise ValueError(f"numpy has no callable {name!r}")

        def _make(f):
            def _apply(*cols):
                import pandas as pd

                out = f(*[c.to_numpy(dtype="float64", na_value=np.nan) for c in cols])
                return pd.Series(np.asarray(out, dtype="float64"))

            return _apply

        spark.udf.register(f"ez_np_{name}", pandas_udf(_make(fn), "double"))
        done.add(name)
