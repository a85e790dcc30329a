"""Engine error types.

Mirrors the error surface of the reference's command parsers
(/root/reference/src/commands/filter_parser.cc, ft_create_parser.cc):
malformed queries / unknown fields / bad options raise, bad *data*
never does (bad field values make keys "untracked", SURVEY.md §1.2).
"""


class SearchError(Exception):
    """Base class for all engine errors."""


class QuerySyntaxError(SearchError):
    """Malformed FT.SEARCH / FT.AGGREGATE query string."""


class UnknownFieldError(SearchError):
    """Query references an attribute not declared in the index schema."""


class UnknownIndexError(SearchError):
    """FT.SEARCH / FT.AGGREGATE against an index that was never created."""


class ExpressionError(SearchError):
    """Malformed APPLY/FILTER expression (compile-time)."""


class SearchTimeoutError(SearchError):
    """An executing search exceeded its TIMEOUT budget and its Spark job
    group was cancelled (the reference's timeout error,
    docs/commands/ft.search.md TIMEOUT; partial-results fanout modes have
    no single-engine analogue)."""
