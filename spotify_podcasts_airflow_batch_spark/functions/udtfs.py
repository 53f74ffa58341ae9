"""Python user-defined table functions (Spark 4 UDTF API).

The engine's rule is built-ins first — everything in the catalog runs
JVM-side, and per-row expansion is `explode`/`sequence` (see
plans/text2.py doc_chunk). A UDTF is the escape hatch for expansions
whose row logic is genuinely imperative: it runs in the Python worker
(Arrow-batched) and joins laterally, so it belongs at the edges of a
plan, after filters have shed data.

`SplitSentences` is the canonical example: sentence boundary logic
(abbreviation handling, quote tracking…) grows beyond what a regex
split expresses. The implementation here is intentionally simple —
the point under test is the API shape: registration, lateral join,
per-row multi-row output, analyze-time static schema.

No reference analogue (the reference never leaves pandas); this is
engine API surface.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sentence_idx int, sentence string, n_tokens int")
class SplitSentences:
    """text → one row per sentence (., !, ? boundaries), with a token
    count per sentence. Stateless eval: safe under retries and
    speculative execution."""

    def eval(self, text: str):
        if not text:
            return
        buf: list[str] = []
        idx = 0
        for ch in text:
            buf.append(ch)
            if ch in ".!?":
                s = "".join(buf).strip()
                if s:
                    yield idx, s, len(s.split())
                    idx += 1
                buf = []
        tail = "".join(buf).strip()
        if tail:
            yield idx, tail, len(tail.split())


def register_udtfs(spark) -> None:
    """Make the UDTFs available to SQL (`LATERAL SplitSentences(text)`)."""
    spark.udtf.register("split_sentences", SplitSentences)
