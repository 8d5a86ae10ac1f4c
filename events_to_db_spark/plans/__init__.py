"""Physical-plan introspection helpers."""

from events_to_db_spark.plans.audit import (  # noqa: F401
    executed_plan,
    plan_counts,
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
)
