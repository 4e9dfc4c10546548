"""Registry composition lints (r14 self-review).

The driver's correctness gate caps at the first 50 registered queries;
through r13 the cap boundary lived only in a comment ("driver cap
boundary" in registry._QUERY_MODULES) plus a rows-only lint — a
registration drag or module miscount that silently pushed an intended
query out of the cap would have passed CI.  These tests make the
boundary machine-checked against registry.CAP_BOUNDARY_MODULE.
"""

from __future__ import annotations

from bigbugdata_spark.registry import (
    CAP_BOUNDARY_MODULE,
    DRIVER_CAP,
    REGISTRY,
    _QUERY_MODULES,
    load_all,
)

load_all()
_NAMES = list(REGISTRY)


def _mod(name: str) -> str:
    return REGISTRY[name].fn.__module__


def test_cap_boundary_lands_exactly_on_declared_module():
    """The 50th registration must come from CAP_BOUNDARY_MODULE and the
    51st from a different module — the boundary sits on a module edge,
    exactly where the rotation comment says it does."""
    assert len(_NAMES) > DRIVER_CAP
    assert _mod(_NAMES[DRIVER_CAP - 1]) == CAP_BOUNDARY_MODULE
    assert _mod(_NAMES[DRIVER_CAP]) != CAP_BOUNDARY_MODULE
    # and nothing from the boundary module leaks past the cap
    after = {_mod(n) for n in _NAMES[DRIVER_CAP:]}
    assert CAP_BOUNDARY_MODULE not in after


def test_cap_modules_equal_declared_prefix():
    """The set of modules defining the first 50 registrations equals
    the _QUERY_MODULES prefix up to and including the boundary — a
    module-level import that DRAGS another registering module into the
    cap (the scd_core failure class) shows up here as an unexpected
    module name."""
    prefix = []
    for m in _QUERY_MODULES:
        prefix.append(m)
        if m == CAP_BOUNDARY_MODULE:
            break
    else:
        raise AssertionError(
            f"{CAP_BOUNDARY_MODULE} not in _QUERY_MODULES — update "
            f"CAP_BOUNDARY_MODULE alongside the rotation"
        )
    got = {_mod(n) for n in _NAMES[:DRIVER_CAP]}
    assert got == set(prefix), (
        f"cap composition drifted from the declared prefix: "
        f"unexpected={sorted(got - set(prefix))}, "
        f"missing={sorted(set(prefix) - got)}"
    )


def test_shim_module_registers_past_the_cap():
    """The rows-only shim queries (no_oracle_shims + the two tail
    modules) must all sit past the cap (VERDICT r12 #2); the shim's own
    import-time guard raises under a gross reordering, this pins the
    exact slot positions."""
    rows_only = [n for n in _NAMES if REGISTRY[n].oracle is None]
    positions = {n: _NAMES.index(n) for n in rows_only}
    assert all(p >= DRIVER_CAP for p in positions.values()), positions
