"""ezdata_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of mfouesneau/ezdata, re-expressed on the
Spark DataFrame/SQL stack (Catalyst-optimized, cluster-scale).
"""

from .astrotable import AstroTable
from .cache import release_caches
from .expr import ExprError, translate
from .plotting import CornerPlot, Group, PairGrid, Plotter
from .session import get_spark, tune_existing
from .table import EzTable

__all__ = [
    "EzTable",
    "AstroTable",
    "translate",
    "ExprError",
    "get_spark",
    "tune_existing",
    "release_caches",
    "Plotter",
    "Group",
    "PairGrid",
    "CornerPlot",
]
__version__ = "0.1.0"
