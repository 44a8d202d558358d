"""Outcome routing — the heart of the reference's dataflow (R1/R2/R5).

The reference's mapper dispatches on the handler's return keyword:
:success / :retry / :skip / :dead-letter / channel-keyword
(mapper.clj:28-69, case at 55-65); a Throwable is treated as :retry.
Retries carry their counter in the message and decrement per hop;
at zero the message moves to the dead set (producer.clj:288-293).

Spark-first re-expression: the handler produces an ``outcome``
column; routing is then N filtered writes of ONE cached micro-batch
(no per-record branching, no Python in the hot path unless the
handler itself is Python). The retry state machine is pure column
math. At scale this is a single pass over the batch plus metadata-
only filters — Catalyst collapses ``filter(outcome = X)`` onto the
cached plan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Valid handler outcomes (mapper.clj:55-65). ``:block`` is a TODO in
#: the reference and intentionally unsupported here too.
VALID_OUTCOMES = ("success", "retry", "skip", "dead-letter")


def outcome_expr(value: Column) -> Column:
    """Demo dispatch rule used by fixtures/tests: thresholds on a
    numeric payload. Real routes supply their own handler; this is
    the column-logic shape every handler compiles down to."""
    return (
        F.when(value < 10.0, "retry")
        .when(value < 20.0, "skip")
        .when(value < 30.0, "dead-letter")
        .otherwise("success")
    )


def validate_outcomes(df: DataFrame, outcome_col: str = "outcome") -> DataFrame:
    """Fail fast on an unknown outcome, mirroring the reference's
    InvalidReturnTypeException on malformed handler returns
    (consumer_handler.clj:36-44) and the "unknown keyword → exception"
    arm of the mapper dispatch (mapper.clj:62-64).

    Implemented as a side-effect-free column assertion:
    ``raise_error`` only fires if an invalid row is actually present,
    so the common path stays fully codegen'd.
    """
    oc = F.col(outcome_col)
    ok = oc.isin(*VALID_OUTCOMES) | oc.startswith("channel:")
    return df.withColumn(
        outcome_col,
        F.when(ok, oc).otherwise(
            F.raise_error(F.concat(F.lit("invalid outcome: "), oc))
        ),
    )


def retry_step_exprs(attempt: Column, max_retries: int) -> tuple[Column, Column]:
    """One hop of the retry state machine (producer.clj:288-293).

    ``attempt`` = retries remaining, where the reference encodes
    "never retried yet" as nil/0-sentinel. Returns
    ``(next_attempt, to_dead_set)``:

    - fresh failure (attempt % cycle == 0 sentinel or NULL) →
      start at ``max_retries`` remaining;
    - otherwise decrement;
    - hitting zero routes to the dead set with the counter reset.
    """
    fresh = attempt.isNull() | (attempt == 0)
    next_attempt = F.when(fresh, F.lit(max_retries)).otherwise(attempt - 1)
    to_dead_set = F.coalesce(attempt == 0, F.lit(False))
    return next_attempt.cast("int"), to_dead_set


def split_by_outcome(
    df: DataFrame, outcome_col: str = "outcome"
) -> dict[str, DataFrame]:
    """Split one (cached) batch into per-outcome DataFrames.

    Caller is expected to ``df.persist()`` first so the handler runs
    once, not once per sink — mirrors 'process once, publish to the
    right queue' (mapper.clj:55-65) without recomputation.
    """
    oc = F.col(outcome_col)
    return {
        "success": df.filter(oc == "success"),
        "retry": df.filter(oc == "retry"),
        "skip": df.filter(oc == "skip"),
        "dead-letter": df.filter(oc == "dead-letter"),
        "channel": df.filter(oc.startswith("channel:")),
    }


def apply_handler_in_pandas(
    df: DataFrame,
    handler: Callable,
    output_schema: str,
) -> DataFrame:
    """Run an arbitrary Python handler over a batch, vectorized.

    The reference invokes the user fn per record on stream threads
    (streams.clj:66-71). Here the handler receives pandas DataFrames
    (Arrow batches) and must return them with an ``outcome`` column —
    the validated contract of consumer_handler.clj:36-44. This is the
    ONE deliberately-Python hot path; everything SQL-expressible
    belongs in column expressions instead.
    """

    def _runner(batches):
        for pdf in batches:
            out = handler(pdf)
            if out is None or "outcome" not in out.columns:
                raise TypeError(
                    "handler must return a DataFrame with an 'outcome' column "
                    f"(one of {VALID_OUTCOMES} or 'channel:<name>')"
                )
            bad = ~(
                out["outcome"].isin(VALID_OUTCOMES)
                | out["outcome"].str.startswith("channel:")
            )
            if bad.any():
                raise TypeError(
                    f"invalid outcomes from handler: {sorted(out['outcome'][bad].unique())}"
                )
            yield out

    return df.mapInPandas(_runner, schema=output_schema)
