"""Physical-plan inspection (SURVEY.md section 4): utilities to assert the
plan shapes that matter at 100 TB -- pushdown, pruning, broadcast, codegen."""

from iot_data_pipeline_spark.plans.inspect import (  # noqa: F401
    broadcast_join_count,
    formatted_plan,
    has_pushed_filters,
    read_schema_columns,
    shuffle_count,
    wholestage_codegen_count,
)
