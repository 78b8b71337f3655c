from .explain import (  # noqa: F401
    formatted_plan,
    executed_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)
