"""End-to-end product/event analytics over the events fixture.

The event-flow tier as a user would chain it (every stage is a
registered, oracle-verified query, plus the parametric api.funnel
surface added in round 6):

    sessionize      -> 30-min-gap sessions per user
    funnel          -> arbitrary step lists + per-step deadlines
    retention       -> weekly cohorts
    rolling WAU     -> exact contract + HLL production form
    attribution     -> purchases credited to session-opening events
    CDC             -> latest-state compaction of the event log

    python examples/event_analytics.py [sf_dir]   # default sf0.001
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_indexing_spark import api  # noqa: E402
from map_reduce_indexing_spark.plans import registry  # noqa: E402
from map_reduce_indexing_spark.session import get_spark  # noqa: E402
from map_reduce_indexing_spark.sources.tables import load_table  # noqa: E402

HOUR_US = 3600 * 1_000_000


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="event-analytics", master="local[4]")
    q = lambda name: registry.get(name).fn(spark, sf_dir)  # noqa: E731

    print("== sessions (30-min gap, single user_id exchange) ==")
    q("rel_sessionize").orderBy("user_id", "start_ts").show(5)

    print("== registered 3-step funnel (view -> click -> purchase) ==")
    q("rel_funnel").show()

    print("== custom funnel via api.funnel: per-transition deadlines ==")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    api.funnel(
        ev,
        ["view", "click", "purchase"],
        deadlines_us=[24 * HOUR_US, None],
    ).show()

    print("== weekly retention cohorts (first 5) ==")
    q("rel_retention_cohorts").orderBy("cohort_week", "week_offset").show(5)

    print("== rolling 7-day WAU: exact contract (first 5 days) ==")
    q("rel_rolling_active_users").orderBy("day").show(5)

    print("== first-touch attribution ==")
    q("rel_attribution_first_touch").show()

    print("== CDC latest state (first 5 users) ==")
    q("rel_cdc_latest_state").orderBy("user_id").show(5)

    spark.stop()


if __name__ == "__main__":
    main()
