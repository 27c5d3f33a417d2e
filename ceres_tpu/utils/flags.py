"""Environment-variable feature flags.

The framework's few escape-hatch toggles (kernel opt-outs, plan overrides)
are env vars; this parses them the way a user expects — "0", "false", "off",
and empty all mean disabled — instead of raw string truthiness where
FLAG=0 would *enable* the flag.
"""

from __future__ import annotations

import os

_FALSY = ("", "0", "false", "no", "off")


def env_flag(name: str, default: bool = False) -> bool:
    """True iff the env var is set to a truthy value ("1", "true", ...)."""
    val = os.environ.get(name)
    if val is None:
        return default
    return val.strip().lower() not in _FALSY
