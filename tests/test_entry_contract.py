"""Driver-contract invariants of __spark_entry__ that need no Spark.

A missing wrapper (registry naming a query function that doesn't exist)
crashes the driver's whole correctness pass, not just one row — these
checks catch that class of wiring bug at pytest time.
"""

from __future__ import annotations

import importlib.util
import sys

#: queries() keys that intentionally have no oracle_sql() entry
#: (non-SQL-expressible; the driver records a rows-only check).
ROWS_ONLY = {
    "fidelity_peaks",
    "fidelity_signal",
    "native_find_peaks",
    "sketch_profile",
    "constrained_peak_attributes",
}


def _entry():
    if "__spark_entry__" in sys.modules:
        return sys.modules["__spark_entry__"]
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__spark_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_queries_registry_is_well_formed():
    mod = _entry()
    qs = mod.queries()
    assert len(qs) >= 70
    for name, fn in qs.items():
        assert callable(fn), name
        assert name == name.strip() and " " not in name


def test_every_query_has_oracle_or_documented_rows_only():
    mod = _entry()
    qs = set(mod.queries())
    oracles = mod.oracle_sql()
    assert set(oracles) <= qs, f"orphan oracles: {set(oracles) - qs}"
    missing = qs - set(oracles) - ROWS_ONLY
    assert not missing, f"queries with neither oracle nor rows-only note: {missing}"
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_rotation_lists_reference_registered_queries():
    mod = _entry()
    qs = set(mod.queries())
    for name in mod._ROTATE_FIRST + mod._ROTATE_LAST:
        assert name in qs, f"rotation names unregistered query {name}"
    # the rotation head must fit the driver's 50-entry verification cap
    assert len(mod._ROTATE_FIRST) <= 50
    ordered = list(mod.queries())
    head = ordered[: len(mod._ROTATE_FIRST)]
    assert head == [n for n in mod._ROTATE_FIRST if n in qs]
