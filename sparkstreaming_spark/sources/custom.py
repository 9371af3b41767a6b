"""Custom Python Data Source (Spark 4 DataSource API) — the engine's
extension point for ingesting from systems Spark has no built-in
connector for (internal feeds, bespoke APIs, proprietary stores).

The reference hard-wires its two ingest paths (CSV dir scan,
Consumer.scala:49-52; batch CSV, Producer.scala:12); this generalizes
ingestion to "anything that can enumerate partitions and yield rows",
with reads parallelized across executors by `partitions()` — each
InputPartition becomes one Spark task, so a 1000-executor cluster pulls
1000 shards concurrently.

The shipped implementation is a DETERMINISTIC synthetic-document
generator: every cell is md5-derived from (seed, doc_id), so the DuckDB
oracle reproduces the exact corpus with SQL arithmetic — giving the
custom-source path a bit-exact differential check instead of a smoke
test. Swap `_row()` for real fetch logic to adapt it.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Small fixed vocabulary: the md5-selected token stream is reproducible
# in DuckDB (see suite/sources_suite.py oracle).
VOCAB = (
    "spark stream batch shuffle join window state queue vector token "
    "model data index merge scan"
).split()
DEFAULT_SEED = "synthdocs-v1"


def _md5_64(s: str) -> int:
    """First 60 bits of md5 as int — mirrors functions/text.py::md5_64
    and DuckDB's cast('0x' || substr(md5(x),1,15) AS bigint)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def synth_text(seed: str, doc_id: int) -> str:
    """5 + (h % 8) tokens; token i = VOCAB[md5_64(seed:doc_id:i) % |V|]."""
    n = 5 + _md5_64(f"{seed}:{doc_id}:len") % 8
    toks = [
        VOCAB[_md5_64(f"{seed}:{doc_id}:{i}") % len(VOCAB)] for i in range(n)
    ]
    return " ".join(toks)


@dataclass
class _Shard(InputPartition):
    start: int
    end: int


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_parts", 8))
        self.seed = options.get("seed", DEFAULT_SEED)

    def partitions(self):
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _Shard(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _Shard):
        seed = self.seed
        for doc_id in range(partition.start, partition.end):
            yield doc_id, synth_text(seed, doc_id)


class SyntheticDocsDataSource(DataSource):
    """`spark.read.format("synthetic_docs").option("n_rows", N).load()`"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


def register_custom_sources(spark) -> None:
    """Idempotent registration (driver restarts re-register freely)."""
    spark.dataSource.register(SyntheticDocsDataSource)
