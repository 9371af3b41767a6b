from . import QuerySpec

QUERIES: dict[str, QuerySpec] = {}
