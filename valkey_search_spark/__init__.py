"""valkey_search_spark — a PySpark-native engine with the query and
data-processing capabilities of valkey-io/valkey-search.

Public surface:
    SearchEngine        FT.CREATE / FT.SEARCH / FT.AGGREGATE / FT.INFO ...
    TagField / NumericField / TextField / VectorField
    CommandDispatcher   reference-style FT.* argv -> engine calls
"""

from .commands import CommandDispatcher
from .catalog import (
    Catalog, IndexSchema, NumericField, TagField, TextField, VectorField,
)
from .errors import (
    ExpressionError, QuerySyntaxError, SearchError, SearchTimeoutError,
    UnknownFieldError, UnknownIndexError,
)
from .operators.search import ReturnField, SearchEngine
from .plans.predicate_translator import QueryLimits
from .session import get_spark

__all__ = [
    "Catalog", "IndexSchema", "NumericField", "TagField", "TextField",
    "VectorField", "SearchEngine", "ReturnField", "QueryLimits", "get_spark",
    "CommandDispatcher",
    "SearchError", "QuerySyntaxError", "UnknownFieldError",
    "UnknownIndexError", "ExpressionError", "SearchTimeoutError",
]
