"""Document chunking: split each document into fixed-size token
windows — the precursor to sequence packing in a training-data
pipeline (every tokenizer/packer consumes bounded-length pieces, not
whole documents).

Scale shape: pure per-row array expressions (split -> slice windows
-> posexplode) — an embarrassingly parallel projection with NO
shuffle; at 100 TB it runs at parquet scan speed with only the text
column read. The fan-out factor is len/chunk_tokens, bounded and
known, so output partition sizing stays predictable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import with_tokens


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_idx, n_chunk_tokens, chunk_text): consecutive
    ``chunk_tokens``-sized windows over the normalized token stream;
    the last chunk per doc is the (non-empty) remainder. An empty
    document yields one empty chunk (split('') is [''] in both
    engines — document identity is preserved through chunking).
    """
    c = int(chunk_tokens)
    toks = with_tokens(docs, id_col, text_col)
    chunks = F.expr(
        f"transform(sequence(0, cast(ceil(size(tokens) / {c}.0) AS INT) - 1), "
        f"i -> concat_ws(' ', slice(tokens, i * {c} + 1, {c})))"
    )
    return toks.select(
        F.col(id_col), F.posexplode_outer(chunks).alias("chunk_idx", "chunk_text")
    ).select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(F.split(F.col("chunk_text"), " ")).cast("long"
               ).alias("n_chunk_tokens"),
        "chunk_text",
    )
