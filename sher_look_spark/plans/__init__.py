"""Physical-plan inspection utilities (scale hygiene).

The engine's rule of thumb at 100 TB: filters reach the scan, small dims
broadcast, Python appears only as ArrowEvalPython/MapInPandas (never
row-at-a-time BatchEvalPython), and shuffle counts stay flat as data grows.
These helpers make those properties assertable in tests and visible in
notebooks.
"""

from sher_look_spark.plans.inspect import (  # noqa: F401
    count_shuffles,
    explain_str,
    has_pushed_filters,
    plan_summary,
    uses_row_python,
)
