"""As-of (time-travel) join as a composition of built-in operators.

Spark has no native as-of join (SURVEY.md §2.3 lists it as a gap to
fill). The classic scalable plan — used here — is the *union-and-carry*
technique:

1. tag left rows (probe) and right rows (build) and union them on a
   common schema;
2. one shuffle: window partitioned by the join key, ordered by
   (event time, side-tag) so each right row sorts immediately before
   any left row with an equal-or-later timestamp;
3. ``last_value(ignorenulls)`` carries the most recent right payload
   forward onto every left row;
4. filter back to left rows.

Cost: ONE exchange + ONE sort — strictly cheaper than the
per-row range subquery (quadratic) and equivalent to what
``pd.merge_asof`` does per group, but fully distributed and skew-safe
under AQE. This beats a Pandas-UDF ``merge_asof`` because everything
stays in Tungsten rows with whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join_left(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    right_payload: dict[str, str],
    inclusive: bool = True,
) -> DataFrame:
    """Left as-of join: for each left row, attach the payload of the
    latest right row with ``right_on <= left_on`` (or ``<`` when
    ``inclusive=False``) within the same ``by`` group.

    ``right_payload`` maps right column → output alias. Right rows that
    tie on (by, time) must be unique — pre-aggregate the right side if
    they are not, otherwise the winner is engine-dependent.
    """
    lcols = [c for c in left.columns]
    payload_src = list(right_payload.keys())

    tagged_left = left.select(
        F.col(left_by).alias("__by"),
        F.col(left_on).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__p_{c}") for c in payload_src],
    )
    tagged_right = right.select(
        F.col(right_by).alias("__by"),
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        *[F.col(c).alias(f"__p_{c}") for c in payload_src],
    )
    # At equal timestamps the right row sorts first iff the join is
    # inclusive (left sees a right row stamped at exactly its own time).
    order_tag = F.col("__is_left").asc() if inclusive else F.col("__is_left").desc()
    w = (
        W.partitionBy("__by")
        .orderBy(F.col("__t").asc(), order_tag)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = tagged_left.unionByName(tagged_right).select(
        *lcols,
        F.col("__is_left"),
        *[
            F.last(F.col(f"__p_{c}"), ignorenulls=True).over(w).alias(alias)
            for c, alias in right_payload.items()
        ],
    )
    return carried.filter(F.col("__is_left") == 1).drop("__is_left")
