"""Python UDTFs (table functions) — the engine's user-extension point
for one-row → many-rows logic that genuinely needs Python. Policy note
(SURVEY §2.8): everything expressible with explode/split stays JVM-side
(see functions/text.py); a UDTF is the escape hatch for logic with no
built-in equivalent — its per-row Python cost is the price of arbitrary
code, so it must never sit in a 100 TB hot path that built-ins cover.

`sentence_split` is deliberately simple so the DuckDB oracle can verify
the UDTF *plumbing* (lateral join, schema, row fan-out) bit-exactly.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

SENT_RE = re.compile(r"[.!?]+")


@udtf(returnType="doc_id bigint, lang string, sent_idx int, n_tokens bigint")
class SentenceSplit:
    """One row per non-empty sentence: (doc_id, lang, sent_idx, n_tokens).
    Sentences split on runs of [.!?]; tokens = whitespace words."""

    def eval(self, doc_id: int, lang: str, text: str):
        if text is None:
            return
        idx = 0
        for raw in SENT_RE.split(text):
            s = raw.strip()
            if not s:
                continue
            yield doc_id, lang, idx, len(s.split())
            idx += 1


def register_udtfs(spark) -> None:
    spark.udtf.register("sentence_split", SentenceSplit)
