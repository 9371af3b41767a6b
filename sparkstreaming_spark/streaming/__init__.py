from .pipeline import StreamingAggSpec, run_available_now, start_kpi_queries
from .producer import produce_segments
from .reconstitution import reconstitute_text

__all__ = [
    "StreamingAggSpec",
    "produce_segments",
    "reconstitute_text",
    "run_available_now",
    "start_kpi_queries",
]
