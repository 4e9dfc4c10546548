"""Environment-variable parsing shared by module-level config constants.

The two TTL knobs (`SPARK_GRAFT_TMP_TTL_S` in dedup_incr_core,
`SPARK_GRAFT_GC_TTL_S` in sources/versioned) grew identical
warn-and-fall-back parsers independently (ADVICE r15 asked for the
hardening twice; VERDICT r15 #5 asked for the fold).  One helper, one
contract: a malformed value degrades to the default with a warning,
never an import-time raise — raising here would take down every query
module that transitively imports the constant's home.
"""

from __future__ import annotations

import os
from typing import Callable, TypeVar

T = TypeVar("T", int, float)


def parse_ttl_env(name: str, default: T, cast: Callable[[str], T]) -> T:
    """Parse env var `name` with `cast` (int or float — int keeps the
    stricter grammar: `int('3.5')` raises, exactly as the pre-fold
    per-site parsers behaved), falling back to `default` with a warning
    on a malformed value."""
    raw = os.environ.get(name, str(default))
    try:
        return cast(raw)
    except ValueError:
        import warnings

        warnings.warn(
            f"{name}={raw!r} is not a valid {cast.__name__}; "
            f"falling back to {default} s",
            stacklevel=2,
        )
        return default
