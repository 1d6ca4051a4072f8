"""Streaming drift monitor: per-event-time-window value-distribution
bin counts maintained as Structured Streaming state, scored against a
frozen baseline with the SAME PSI term formula as the batch
``operators/dq2.psi_drift`` gate.

Split of work (the CMS/HLL pattern from ``heavyhitters.py`` /
``cardinality.py``):

1. **In the stream**: assign each row a bin from FIXED baseline edges
   (pure expression — no quantiles on the stream), then a watermarked
   windowed count per (window, bin). State is bounded: (#windows in
   watermark horizon) x (#bins + 1) rows; append-mode capable, so
   closed windows flow to any sink.
2. **On the sink contents** (or any batch relation of the same
   shape): ``psi_from_counts`` joins the observed bin shares of each
   window against the baseline shares and folds the PSI terms — the
   scoring is a tiny broadcast join, re-runnable and engine-portable
   (quantized BIGINT term sums, the SCALING.md rule).

Batch twin ``binned_window_batch`` uses the identical bin + window
expressions, so stream state after a replay equals the batch relation
bit-for-bit (asserted on sf0.01 in
``tests/test_streaming_drift.py``).

Scale: the streaming aggregation shuffles once on (window, bin) —
bins are a constant, so skew is impossible by construction; the
baseline is a broadcast list of edges.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.series import round_portable

__all__ = ["bin_expr", "baseline_edges", "baseline_shares",
           "binned_window_stream", "binned_window_batch",
           "psi_from_counts", "chi2_from_counts", "js_from_counts"]

PSI_Q = 10 ** 8


def bin_expr(value_col: str, edges: Sequence[float]) -> str:
    """SQL CASE assigning a bin index from fixed ascending ``edges``:
    bin i covers [edges[i-1], edges[i]); bin 0 is the left tail and
    bin len(edges) the right tail. Identical text on any engine."""
    parts = ["CASE"]
    for i, e in enumerate(edges):
        parts.append(f"WHEN {value_col} < {float(e)!r} THEN {i}")
    parts.append(f"ELSE {len(edges)} END")
    return " ".join(parts)


def baseline_edges(df: DataFrame, value_col: str,
                   n_bins: int = 10) -> list[float]:
    """Approximate-quantile bin edges from a baseline batch — the ONE
    inexact step, taken once offline and then FROZEN (the stream and
    every rescore use the same floats, so determinism holds from here
    on)."""
    probs = [i / n_bins for i in range(1, n_bins)]
    return df.approxQuantile(value_col, probs, 1e-4)


def baseline_shares(df: DataFrame, value_col: str,
                    edges: Sequence[float]) -> DataFrame:
    """(bin, ref_n) reference bin counts of the baseline batch."""
    return (
        df.selectExpr(f"{bin_expr(value_col, edges)} AS bin")
        .groupBy("bin").agg(F.count(F.lit(1)).alias("ref_n"))
    )


def binned_window_stream(stream_df: DataFrame, ts_col: str,
                         value_col: str, edges: Sequence[float],
                         window: str = "1 hour",
                         watermark: str = "1 hour") -> DataFrame:
    """(window, bin, n): watermarked per-event-time-window bin counts
    — the streaming state IS the batch relation."""
    if not stream_df.isStreaming:
        raise ValueError(
            "binned_window_stream expects a streaming DataFrame; "
            "use binned_window_batch for batch")
    return (
        stream_df.withWatermark(ts_col, watermark)
        .select(
            F.window(ts_col, window).alias("window"),
            F.expr(f"{bin_expr(value_col, edges)} AS bin"),
        )
        .groupBy("window", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def binned_window_batch(df: DataFrame, ts_col: str, value_col: str,
                        edges: Sequence[float],
                        window: str = "1 hour") -> DataFrame:
    """Identical-expression batch twin of ``binned_window_stream``."""
    return (
        df.select(
            F.window(ts_col, window).alias("window"),
            F.expr(f"{bin_expr(value_col, edges)} AS bin"),
        )
        .groupBy("window", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def psi_from_counts(counts: DataFrame, ref: DataFrame) -> DataFrame:
    """(window_start, window_end, n, psi): PSI of each window's bin
    distribution vs the baseline. Same term as ``dq2.psi_drift``
    (``(p_obs - p_ref) * ln(p_obs / p_ref)``, bins missing on either
    side skipped), terms quantized to BIGINT before the fold; > 0.2
    is the conventional investigate threshold."""
    from pyspark.sql import Window

    tot_ref = ref.agg(F.sum("ref_n").alias("__tr"))
    po = "CAST(n AS DOUBLE) / CAST(__tw AS DOUBLE)"
    pr = "CAST(ref_n AS DOUBLE) / CAST(__tr AS DOUBLE)"
    term = (
        f"CASE WHEN n > 0 AND ref_n > 0 THEN "
        f"CAST(round((({po}) - ({pr})) * ln(({po}) / ({pr})) "
        f"* {PSI_Q}) AS BIGINT) ELSE 0 END"
    )
    joined = (
        counts.join(F.broadcast(ref), "bin", "left")
        .crossJoin(F.broadcast(tot_ref))
        # Per-window total as a window sum over the same partitioning
        # the final groupBy needs (a self-join here would conflict on
        # the struct attribute and cost an extra exchange).
        .withColumn("__tw", F.sum("n").over(Window.partitionBy("window")))
        .withColumn("__t", F.expr(term))
    )
    return (
        joined.groupBy("window")
        .agg(F.sum("n").cast("bigint").alias("n"),
             F.sum("__t").alias("__psi_q"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
            round_portable(F.expr(
                f"CAST(__psi_q AS DOUBLE) / {float(PSI_Q)!r}"), 6
            ).alias("psi"),
        )
    )


def js_from_counts(counts: DataFrame, ref: DataFrame) -> DataFrame:
    """(window_start, window_end, n, js): Jensen-Shannon divergence of
    each window's bin distribution vs the baseline — the symmetric,
    BOUNDED ([0, ln 2]) companion to PSI over the SAME (window, bin,
    n) state relation (PSI explodes when a bin's observed share -> 0;
    JS saturates instead, so it ranks windows even under total
    distribution collapse).

    Baseline bins a window never observed need no (window x bin)
    grid: with p = 0 the integrand collapses to ``0.5 * q * ln 2``,
    so JS = 0.5 * sum_present[p ln(p/m) + q ln(q/m)]
    + 0.5 ln(2) * (1 - sum_present q) — the ``operators/text9``
    absent-mass identity, keeping the plan identical to PSI's (one
    broadcast join on bin, one window sum, one reduction). Terms
    quantize to BIGINT before the fold."""
    from pyspark.sql import Window

    ln2 = 0.6931471805599453
    tot_ref = ref.agg(F.sum("ref_n").alias("__tr"))
    po = "(CAST(n AS DOUBLE) / CAST(__tw AS DOUBLE))"
    pr = "(CAST(ref_n AS DOUBLE) / CAST(__tr AS DOUBLE))"
    m = f"(({po} + {pr}) / 2.0)"
    # n > 0 guard mirrors psi_from_counts (unreachable via
    # binned_window_* which only emits counts >= 1, but the function
    # is public): without it a zero-count row's 0*ln(0) goes NULL and
    # is silently dropped while its baseline share was still removed
    # from the absent-mass remainder, undercounting JS by
    # 0.5*q*ln2 per such bin. With n = 0 the bin IS absent from the
    # window, so its whole contribution belongs to the remainder:
    # term = 0 and q stays OUT of __q.
    term = (
        f"CASE WHEN n > 0 AND ref_n > 0 THEN "
        f"CAST(round(({po} * ln({po} / {m}) "
        f"+ {pr} * ln({pr} / {m})) * {PSI_Q}) AS BIGINT) "
        # bin absent from the BASELINE: q = 0, integrand = p ln 2
        f"WHEN n > 0 THEN "
        f"CAST(round({po} * {ln2!r} * {PSI_Q}) AS BIGINT) "
        f"ELSE 0 END"
    )
    qref = (f"CASE WHEN n > 0 AND ref_n > 0 THEN "
            f"CAST(round({pr} * {PSI_Q}) AS BIGINT) ELSE 0 END")
    joined = (
        counts.join(F.broadcast(ref), "bin", "left")
        .crossJoin(F.broadcast(tot_ref))
        .withColumn("__tw", F.sum("n").over(Window.partitionBy("window")))
        .withColumn("__t", F.expr(term))
        .withColumn("__q", F.expr(qref))
    )
    return (
        joined.groupBy("window")
        .agg(F.sum("n").cast("bigint").alias("n"),
             F.sum("__t").alias("__js_q"),
             F.sum("__q").alias("__qr_q"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
            round_portable(F.expr(
                f"0.5 * CAST(__js_q AS DOUBLE) / {float(PSI_Q)!r} "
                f"+ 0.5 * {ln2!r} * (1.0 - CAST(__qr_q AS DOUBLE) "
                f"/ {float(PSI_Q)!r})"), 6).alias("js"),
        )
    )


def chi2_from_counts(counts: DataFrame, ref: DataFrame) -> DataFrame:
    """(window_start, window_end, n, dof, chi2): Pearson
    goodness-of-fit of each window's bin counts against the baseline
    distribution — the classical-significance companion to the PSI
    score, over the SAME (window, bin, n) state relation (so the
    stream==batch equality proven for the counts carries over).

    Expected counts are ``p_ref * n_window`` over ALL baseline bins:
    a baseline bin a window never observed still contributes its
    ``O = 0`` term — without materializing a (window x bin) grid,
    because ``(0 - e)^2 / e = e`` and the expectations sum to
    ``n_window``, so ``chi2 = n_w + sum_present((o - e)^2/e - e)``.
    That keeps the plan identical to PSI's (one broadcast join on
    bin, one window sum, one reduction) and sidesteps the
    conflicting-window-attribute self-join. Bins absent from the
    BASELINE are skipped (their expectation is undefined);
    ``dof = (#baseline bins) - 1``. Per-row terms quantize to BIGINT
    before the fold (the stats2.chi2_independence determinism
    scheme). Conventional alarm: chi2 above the chi2_{dof} critical
    value."""
    from pyspark.sql import Window

    tot_ref = ref.agg(
        F.sum("ref_n").alias("__tr"),
        F.count(F.lit(1)).cast("bigint").alias("__nbins"),
    )
    e = ("(CAST(ref_n AS DOUBLE) / CAST(__tr AS DOUBLE)) "
         "* CAST(__tw AS DOUBLE)")
    term = (
        f"CASE WHEN ref_n > 0 THEN "
        f"CAST(round(((CAST(n AS DOUBLE) - ({e})) "
        f"* (CAST(n AS DOUBLE) - ({e})) / ({e}) - ({e})) * {PSI_Q}) "
        f"AS BIGINT) ELSE 0 END"
    )
    joined = (
        counts.join(F.broadcast(ref), "bin", "left")
        .crossJoin(F.broadcast(tot_ref))
        .withColumn("__tw", F.sum("n").over(Window.partitionBy("window")))
        .withColumn("__t", F.expr(term))
    )
    return (
        joined.groupBy("window")
        .agg(F.sum("n").cast("bigint").alias("n"),
             F.max("__nbins").alias("__nb"),
             F.sum("__t").alias("__chi_q"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
            (F.col("__nb") - 1).cast("bigint").alias("dof"),
            round_portable(F.expr(
                f"CAST(n AS DOUBLE) "
                f"+ CAST(__chi_q AS DOUBLE) / {float(PSI_Q)!r}"), 6
            ).alias("chi2"),
        )
    )
