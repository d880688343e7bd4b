"""As-of (backward temporal) join — SURVEY.md §2.3 J6.

The reference has no joins at all (SURVEY.md §2.3); this is part of the
EXT tier: stream/event enrichment ("attach the latest right-side row at
or before each left-side timestamp"), the classic attribution /
point-in-time-correctness operator.

Spark has no built-in as-of join, so it is composed from existing
DataFrame ops (the SURVEY §2 "custom operator, option (a)" path):

    union(tagged left, tagged right)
      -> window over (key) ordered by (ts, side, tiebreak)
      -> last(payload, ignorenulls) over rows UNBOUNDED PRECEDING..CURRENT
      -> keep left rows whose carried payload is non-null

This is the scalable formulation: ONE hash shuffle on the equality key
(both inputs together), one sort within partitions — identical cost
shape to a sort-merge join, with no per-left-row candidate explosion.
The naive alternative (equi-join on key + range filter + row_number)
materializes |left| x |matching right| intermediate rows, which at 100 TB
with years of history per key is quadratic blow-up; this one is linear.

Skew caveat: AQE's skew mitigation splits oversized SHUFFLE JOIN
partitions; it does NOT apply to window partitions — a window partition
is atomic, so one pathologically hot key (a bot user with 10^8 events)
lands on a single task. The mitigation when that matters is a salted
two-phase pass: (1) window within (key, time-chunk) salt partitions,
carrying each chunk's last payload; (2) a second, much smaller window
over per-chunk boundaries to resolve rows whose match lies in an
earlier chunk. For organic event data (max key cardinality << partition
budget) the single-window form here is the right default — the salt
adds a full extra shuffle that only pays off under real skew.

Tie semantics: right rows sort BEFORE left rows at an equal timestamp,
so a right row with right_ts == left_ts is visible (<= semantics, the
DuckDB/pandas `ASOF JOIN` default). Among right rows with the same
timestamp the largest tiebreak column wins, deterministically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..plans.registry import register
from ..sources.tables import load_table

_SIDE = "__asof_side"
_T = "__asof_t"


def _asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    tiebreak: str,
    *,
    forward: bool,
) -> DataFrame:
    """Shared body of the two as-of directions — one parameterized
    implementation so tie and NULL semantics cannot drift between them.

    NULL semantics match the SQL comparison (`ts <= t` / `ts >= t` is
    NULL-falsy): rows with a NULL timestamp on either side are dropped
    up front. Without the filter, a NULL-ts left row sorts at the
    partition edge where its window frame sees every right row —
    phantom matches.

    backward: right rows sort BEFORE left at an equal timestamp and
    `last(ignorenulls)` over (-inf, current] carries the latest prior
    payload (max tiebreak wins among equal timestamps).
    forward: left rows sort BEFORE right at an equal timestamp and
    `first(ignorenulls)` over [current, +inf) carries the next payload
    (min tiebreak wins).
    """
    left_side = 0 if forward else 1
    lt = (
        left.filter(F.col(left_ts).isNotNull())
        .withColumn(_SIDE, F.lit(left_side))
        .withColumn(_T, F.col(left_ts))
    )
    rt = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(key),
        F.col(right_ts).alias(_T),
        F.lit(1 - left_side).alias(_SIDE),
        *[F.col(c) for c in payload_cols],
    )
    u = lt.unionByName(rt, allowMissingColumns=True)

    base = Window.partitionBy(key).orderBy(F.col(_T), F.col(_SIDE), F.col(tiebreak))
    if forward:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carry = F.first
    else:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carry = F.last
    carried = u.select(
        *[c for c in left.columns],
        F.col(_SIDE),
        *[carry(c, ignorenulls=True).over(w).alias(f"__p_{c}") for c in payload_cols],
    )
    out = carried.filter(
        (F.col(_SIDE) == left_side) & F.col(f"__p_{tiebreak}").isNotNull()
    )
    for c in payload_cols:
        out = out.withColumn(c, F.col(f"__p_{c}")).drop(f"__p_{c}")
    return out.drop(_SIDE)


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    tiebreak: str,
) -> DataFrame:
    """For every left row, attach `payload_cols` of the latest right row
    with ``right[right_ts] <= left[left_ts]`` and equal `key` (inner:
    left rows with no prior right row — or a NULL timestamp — are
    dropped, matching the SQL comparison's NULL-falsy semantics).

    `payload_cols` must exist on `right` only (rename before calling for
    self-joins); `tiebreak` must be one of them and orderable — among
    right rows sharing a timestamp, the max-tiebreak row wins.
    """
    return _asof_join(
        left, right, key, left_ts, right_ts, payload_cols, tiebreak, forward=False
    )


def asof_join_backward_salted(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    tiebreak: str,
    chunk_seconds: int = 3600,
) -> DataFrame:
    """Backward as-of join for HOT keys: the salted two-phase form the
    module docstring describes. Result-identical to `asof_join_backward`
    including NULL payload values (each payload column's cross-chunk
    fallback is its own last-non-null summary, mirroring the plain
    form's independent per-column carry; property-tested with NULLs).
    Use it when one key's row count exceeds a task's comfortable
    partition size — window partitions are atomic, so the single-window
    form puts a 10^8-event bot user on one task.

    Phase 1 windows within (key, time-chunk): each chunk of a hot key is
    its own partition, so parallelism = key x active-chunks. Phase 2
    resolves rows whose match lies in an earlier chunk via a second
    window over per-(key, chunk) summaries — ONE row per chunk, so the
    phase-2 partition for a key holds #chunks rows, not #events.

    Size `chunk_seconds` so a hot key's rows per chunk fit a task
    (e.g. 3600 for hourly chunks at ~10^4 events/sec/key).
    """
    chunk_us = F.lit(int(chunk_seconds) * 1_000_000)
    left_side, _CH = 1, "__asof_chunk"
    lt = (
        left.filter(F.col(left_ts).isNotNull())
        .withColumn(_SIDE, F.lit(left_side))
        .withColumn(_T, F.col(left_ts))
    )
    rt = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(key),
        F.col(right_ts).alias(_T),
        F.lit(0).alias(_SIDE),
        *[F.col(c) for c in payload_cols],
    )
    u = lt.unionByName(rt, allowMissingColumns=True).withColumn(
        _CH, F.floor(F.unix_micros(F.col(_T)) / chunk_us)
    )

    # Phase 1: in-chunk carry — same ordering semantics as the plain
    # form, but the window partition is (key, chunk).
    w1 = (
        Window.partitionBy(key, _CH)
        .orderBy(F.col(_T), F.col(_SIDE), F.col(tiebreak))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *[c for c in left.columns],
        F.col(_SIDE),
        F.col(_CH),
        *[F.last(c, ignorenulls=True).over(w1).alias(f"__p_{c}") for c in payload_cols],
    )

    # Per-(key, chunk) summary: the last NON-NULL value of EACH payload
    # column independently — `max(struct(t, tiebreak, value))` over the
    # rows where that column is non-null (struct comparison is
    # lexicographic, matching the carry order). Per-column, not one
    # max-row struct: the plain form's `last(c, ignorenulls)` carries
    # each column independently across full history, so a column that is
    # NULL in a chunk's final row must still fall back to its latest
    # earlier non-null value — a single last-row summary would lose it.
    summary = (
        rt.withColumn(_CH, F.floor(F.unix_micros(F.col(_T)) / chunk_us))
        .groupBy(key, _CH)
        .agg(
            *[
                F.max(
                    F.when(
                        F.col(c).isNotNull(),
                        F.struct(
                            F.col(_T).alias("t"),
                            F.col(tiebreak).alias("tb"),
                            F.col(c).alias("v"),
                        ),
                    )
                ).alias(f"__last_{c}")
                for c in payload_cols
            ]
        )
    )
    # Phase 2: carry each chunk's summary forward over the (tiny)
    # chunk axis, shifted one chunk so a row sees only EARLIER chunks.
    w2 = (
        Window.partitionBy(key)
        .orderBy(_CH)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # Left rows may sit in chunks with no right rows at all; union the
    # distinct (key, chunk) frame so every populated chunk has a
    # boundary row.
    chunks = carried.select(key, _CH).distinct()
    boundaries = (
        chunks.join(summary, [key, _CH], "left")
        .select(
            key,
            _CH,
            *[
                F.last(f"__last_{c}", ignorenulls=True)
                .over(w2)
                .alias(f"__prior_{c}")
                for c in payload_cols
            ],
        )
    )

    resolved = carried.filter(F.col(_SIDE) == left_side).join(
        boundaries, [key, _CH], "left"
    )
    out = resolved
    for c in payload_cols:
        out = out.withColumn(
            c, F.coalesce(F.col(f"__p_{c}"), F.col(f"__prior_{c}").getField("v"))
        ).drop(f"__p_{c}", f"__prior_{c}")
    out = out.filter(F.col(tiebreak).isNotNull())
    return out.drop(_SIDE, _CH)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    tiebreak: str,
) -> DataFrame:
    """Mirror of asof_join_backward: attach the EARLIEST right row with
    ``right[right_ts] >= left[left_ts]`` and equal `key` (inner; NULL
    timestamps dropped on both sides). Among right rows sharing a
    timestamp the MIN tiebreak wins.
    """
    return _asof_join(
        left, right, key, left_ts, right_ts, payload_cols, tiebreak, forward=True
    )


@register(
    "rel_join_asof",
    oracle="""
        SELECT event_id, user_id, ts, click_id, click_ts,
               epoch_us(ts) - epoch_us(click_ts) AS lag_us
        FROM (
            SELECT p.event_id, p.user_id, p.ts,
                   c.event_id AS click_id, c.ts AS click_ts,
                   ROW_NUMBER() OVER (PARTITION BY p.event_id
                                      ORDER BY c.ts DESC, c.event_id DESC) AS rn
            FROM events p
            JOIN events c
              ON c.user_id = p.user_id
             AND c.ts <= p.ts
             AND c.event_type = 'click'
            WHERE p.event_type = 'purchase'
        ) WHERE rn = 1
    """,
    tier="relational",
    doc="As-of join (SURVEY.md §2.3 J6): attribute each purchase event to "
    "the same user's latest preceding click. Union+window formulation — "
    "one shuffle, no candidate-pair blow-up; the oracle uses the "
    "quadratic join+row_number formulation, fine at sf0.01.",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_src_ts"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = asof_join_backward(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="click_src_ts",
        payload_cols=["click_id", "click_ts"],
        tiebreak="click_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "click_id",
        "click_ts",
        (F.unix_micros("ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )


@register(
    "rel_join_asof_salted",
    export=False,  # pytest-verified variant; kept out of the external window
    oracle="""
        SELECT event_id, user_id, ts, click_id, click_ts,
               epoch_us(ts) - epoch_us(click_ts) AS lag_us
        FROM (
            SELECT p.event_id, p.user_id, p.ts,
                   c.event_id AS click_id, c.ts AS click_ts,
                   ROW_NUMBER() OVER (PARTITION BY p.event_id
                                      ORDER BY c.ts DESC, c.event_id DESC) AS rn
            FROM events p
            JOIN events c
              ON c.user_id = p.user_id
             AND c.ts <= p.ts
             AND c.event_type = 'click'
            WHERE p.event_type = 'purchase'
        ) WHERE rn = 1
    """,
    tier="relational",
    doc="Salted two-phase variant of rel_join_asof, same oracle: phase 1 "
    "windows within (user, hour-chunk) so a hot key's events spread "
    "across chunk partitions; phase 2 resolves cross-chunk matches over "
    "per-chunk summaries (one row per chunk). The skew mitigation for "
    "as-of joins that AQE cannot provide (window partitions are atomic).",
)
def q_join_asof_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_src_ts"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = asof_join_backward_salted(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="click_src_ts",
        payload_cols=["click_id", "click_ts"],
        tiebreak="click_id",
        chunk_seconds=3600,
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "click_id",
        "click_ts",
        (F.unix_micros("ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )


@register(
    "rel_join_asof_forward",
    oracle="""
        SELECT click_id, user_id, click_ts, purchase_id, purchase_ts,
               epoch_us(purchase_ts) - epoch_us(click_ts) AS wait_us
        FROM (
            SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
                   p.event_id AS purchase_id, p.ts AS purchase_ts,
                   ROW_NUMBER() OVER (PARTITION BY c.event_id
                                      ORDER BY p.ts ASC, p.event_id ASC) AS rn
            FROM events c
            JOIN events p
              ON p.user_id = c.user_id
             AND p.ts >= c.ts
             AND p.event_type = 'purchase'
            WHERE c.event_type = 'click'
        ) WHERE rn = 1
    """,
    tier="relational",
    doc="Forward as-of join (SURVEY.md §2.3 J6): for each click, the same "
    "user's NEXT purchase — time-to-conversion. Same union+window shape "
    "as the backward direction, scanned forward; the oracle uses the "
    "quadratic join+row_number formulation, fine at sf0.01.",
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_src_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    joined = asof_join_forward(
        clicks,
        purchases,
        key="user_id",
        left_ts="click_ts",
        right_ts="purchase_src_ts",
        payload_cols=["purchase_id", "purchase_ts"],
        tiebreak="purchase_id",
    )
    return joined.select(
        "click_id",
        "user_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("wait_us"),
    )
