"""Plan-shape regression net over the whole registered query surface.

Builds the physical plan of every ``queries()`` entry at sf0.001 and
asserts no unpartitioned cartesian product sneaks in — the one join
shape that is always wrong at scale. (Bounded broadcast cross joins —
the 1-row scalar in stim_normalize, the documented brute-force ANN
baseline — plan as BroadcastNestedLoopJoin and are allowed.)
"""

from __future__ import annotations

import sys

from tests.conftest import SF001


def test_no_cartesian_product_in_any_registered_query(spark):
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    failures = []
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, SF001)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # a query that cannot even plan is a bug
            failures.append(f"{name}: failed to plan ({exc})")
            continue
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct in plan")
    assert not failures, "\n".join(failures)
