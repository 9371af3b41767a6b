from .upsert import UpsertSink, upsert_partition
from .files import write_csv_segments, append_text_file

__all__ = ["UpsertSink", "append_text_file", "upsert_partition", "write_csv_segments"]
