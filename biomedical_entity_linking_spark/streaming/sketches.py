"""Incremental sketch maintenance over a page stream.

The register sketches (``operators/sketch.py``) are the one family of
aggregations that can run over an UNBOUNDED stream with finite state
and no watermark: the HLL state is ≤ keys × 256 integer registers BY
CONSTRUCTION, and max() is associative/idempotent, so every micro-batch
folds into the same bounded table that the batch operator builds — no
event-time windows, no state expiry, no late-data semantics needed.
That is the streaming pitch of a sketch: "distinct tokens seen so far,
per source, forever" is a query no exact operator can answer with
bounded state.

``hll_register_stream`` declares the streaming aggregation (complete
output mode — the whole register table is tiny and rewritten per
trigger); ``maintain_hll_registers`` runs it into a parquet register
table via ``foreachBatch`` overwrite (idempotent: the table is a pure
function of the stream prefix, so replaying a batch rewrites the same
rows). Exactly-once state comes from the streaming checkpoint.

Certification: streaming-vs-batch EQUIVALENCE — after an AvailableNow
catch-up run the maintained register table must equal the batch
``vocab_hll_registers`` construction over the same corpus, including
across a second drop resumed from the checkpoint (pinned by pytest,
``tests/test_streaming_sketches.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketch import HLL_M, _BITLEN_CASE, _SUFFIX_BITS


def hll_register_stream(
    pages_stream: DataFrame, key_col: str = "lang"
) -> DataFrame:
    """Streaming HLL register maintenance over the token vocabulary of
    ``text``, keyed by ``key_col``. Same md5/bucket/rho construction as
    the batch sketch — the streaming state IS the sketch, so the state
    store holds ≤ keys × 256 rows at any stream length."""
    toks = pages_stream.select(
        F.col(key_col).alias("source"),
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    )
    hashed = toks.select(
        "source",
        F.conv(F.substring(F.md5("token"), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    staged = hashed.select(
        "source",
        (F.col("h") % HLL_M).alias("bucket"),
        F.expr(f"h div {HLL_M}").alias("suffix"),
    ).select(
        "source",
        "bucket",
        (F.lit(_SUFFIX_BITS + 1) - F.expr(_BITLEN_CASE)).alias("rho"),
    )
    return staged.groupBy("source", "bucket").agg(
        F.max("rho").alias("max_rho")
    )


def maintain_hll_registers(
    pages_stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    key_col: str = "lang",
    available_now: bool = True,
):
    """Run the register stream into a parquet register table.

    Complete-mode aggregation → ``foreachBatch`` overwrite of the (tiny)
    register table each trigger. Overwrite is the correct sink verb for
    sketch state: the table is a pure function of the stream prefix, so
    replay after failure rewrites identical rows (idempotent), and
    readers always see a complete, internally-consistent sketch.
    Returns the started ``StreamingQuery``.
    """
    regs = hll_register_stream(pages_stream, key_col=key_col)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.orderBy("source", "bucket").write.mode("overwrite").parquet(
            table_dir
        )

    writer = (
        regs.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cms_register_stream(
    pages_stream: DataFrame, key_col: str = "lang"
) -> DataFrame:
    """Streaming Count-Min register maintenance: same salted-md5 bucket
    construction as the batch ``token_cms_registers``; count() is the
    streaming aggregate (sum-mergeable across micro-batches by the state
    store). State ≤ keys × d × w rows at any stream length."""
    from ..operators.sketch import CMS_D, CMS_W

    toks = pages_stream.select(
        F.col(key_col).alias("source"),
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    )
    cells = toks.select(
        "source",
        F.posexplode(
            F.array(
                *[
                    (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(F.lit(f"{j}:"), F.col("token"))
                                ),
                                1,
                                15,
                            ),
                            16,
                            10,
                        ).cast("long")
                        % CMS_W
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("row", "bucket"),
    )
    return cells.groupBy("source", "row", "bucket").agg(
        F.count("*").alias("cnt")
    )


def maintain_cms_registers(
    pages_stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    key_col: str = "lang",
    available_now: bool = True,
):
    """Run the CMS register stream into a parquet register table
    (complete-mode + idempotent ``foreachBatch`` overwrite, exactly as
    ``maintain_hll_registers``)."""
    regs = cms_register_stream(pages_stream, key_col=key_col)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.orderBy("source", "row", "bucket").write.mode(
            "overwrite"
        ).parquet(table_dir)

    writer = (
        regs.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
