from .inspect import (  # noqa: F401
    assert_scan_columns,
    count_plan_nodes,
    physical_plan,
)
