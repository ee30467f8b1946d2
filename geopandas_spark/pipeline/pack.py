"""Sequence packing for training-data pipelines: assign documents to
fixed-token-budget training sequences (the concat-then-chunk packing used
for LM pre-training — documents concatenate in a deterministic order and
sequences cut every ``budget`` tokens).

The core primitive is a *distributed* cumulative sum: a naive
``Window.orderBy(id)`` with no partition key collapses the whole dataset
onto one reducer — the classic 100 TB trap. Here:

1. range-repartition + sort by the order key (one shuffle, the same cost
   class as any global sort);
2. pass 1 collects per-partition token totals (one tiny row per
   partition);
3. the driver prefix-sums those totals (a ~thousand-element Python loop)
   and broadcasts the per-partition offsets;
4. pass 2 adds local cumsum + partition offset, map-side.

Output is independent of where the sampled range boundaries fall — the
cumsum depends only on the global order — so results are deterministic
and the DuckDB oracle twin is a plain ``SUM(...) OVER (ORDER BY ...)``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType


def distributed_cumsum(df: DataFrame, order_col: str, val_col: str,
                       out_col: str = "cumsum",
                       num_partitions: int = None) -> DataFrame:
    """Exclusive prefix sum of ``val_col`` in global ``order_col`` order
    (out_col = sum of all strictly-earlier rows). Scales: no single-reducer
    window, one range shuffle + a per-partition-totals collect."""
    from pyspark import TaskContext

    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    parts = (df.repartitionByRange(n, F.col(order_col))
               .sortWithinPartitions(order_col))
    parts.persist()

    tot_schema = StructType([StructField("pid", LongType()),
                             StructField("total", LongType())])

    def totals(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        t = 0
        for pdf in batches:
            t += int(pdf[val_col].sum())
        yield pd.DataFrame({"pid": [pid], "total": [t]})

    rows = parts.mapInPandas(totals, tot_schema).collect()
    offsets = {}
    acc = 0
    for r in sorted(rows, key=lambda r: r["pid"]):
        offsets[r["pid"]] = acc
        acc += r["total"]

    out_schema = StructType(df.schema.fields +
                            [StructField(out_col, LongType())])

    def add_cumsum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        run = offsets.get(pid, 0)
        for pdf in batches:
            c = pdf[val_col].cumsum()
            pdf = pdf.copy()
            pdf[out_col] = (c - pdf[val_col]) + run   # exclusive prefix
            run += int(pdf[val_col].sum())
            yield pdf

    return parts.mapInPandas(add_cumsum, out_schema)


def pack_sequences(df: DataFrame, budget: int, *,
                   token_col: str = None, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Concat-then-chunk packing: documents ordered by ``id_col``
    concatenate into one token stream; sequence k owns tokens
    [k·budget, (k+1)·budget). Adds:

    - ``n_tokens``  — the document's token count (whitespace tokens when
      ``token_col`` is absent);
    - ``tok_start`` — the document's offset in the global stream;
    - ``seq_first`` / ``seq_last`` — first/last training sequence the
      document lands in;
    - ``n_seqs``    — how many sequences it spans (boundary-crossing docs
      split, the standard LM-pretraining behavior).
    """
    from geopandas_spark.pipeline.text import token_count

    if token_col is None:
        df = df.withColumn("n_tokens",
                           token_count(text_col).cast("long"))
        token_col = "n_tokens"
    elif token_col != "n_tokens":
        df = df.withColumn("n_tokens", F.col(token_col).cast("long"))
    out = distributed_cumsum(df, id_col, "n_tokens", out_col="tok_start")
    b = F.lit(int(budget)).cast("long")
    return (out.withColumn("seq_first", F.floor(F.col("tok_start") / b))
               .withColumn("seq_last",
                           F.floor((F.col("tok_start")
                                    + F.greatest(F.col("n_tokens"),
                                                 F.lit(1)) - 1) / b))
               .withColumn("n_seqs", F.col("seq_last")
                           - F.col("seq_first") + 1))
