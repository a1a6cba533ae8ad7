"""C1 — engine configuration with per-rule override merging.

Reference semantics (/root/reference/config/config.go:23-59,
logtrics.go:71-105): a global TOML config; each rule may override ONLY
the graphite/logging/expression sections — overriding
scriptfile/scriptdir/mode/tcp/udp raises an error (logtrics.go:98-99),
and unknown keys raise too (logtrics.go:101-103).  The merge deep-copies
the global config so rules never mutate each other.

Spark mapping: "graphite" generalizes to the sink/rollup settings
(tiers, chunk span, store root), "expression" to the rule's pattern,
"logging" stays logging.  Reader wiring (mode/tcp/udp) is session-level
here exactly as it is process-level there — hence still forbidden at
rule scope.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field
from typing import Any

# rule-overridable sections (logtrics.go:85-96)
OVERRIDABLE = {"graphite", "logging", "expression"}
# forbidden at rule level (logtrics.go:98-99)
FORBIDDEN = {"scriptfile", "scriptdir", "mode", "tcp", "udp"}

DEFAULTS: dict[str, Any] = {
    "graphite": {
        # reference default flush interval 30s (cmd/logtrics/main.go:59)
        "interval": 30,
        "tiers": ["1m", "5m", "1h", "1d"],
        "chunk_span": "1d",
        "store": None,
        "debug": False,
    },
    "logging": {"level": "info", "console": True},
    "expression": None,
    "buffer": {"size": 0},  # app.go:54 / main.go:43
}


class ConfigError(ValueError):
    pass


@dataclass
class EngineConfig:
    conf: dict[str, Any] = field(default_factory=lambda: copy.deepcopy(DEFAULTS))

    def merged(self, overrides: dict[str, Any] | None) -> dict[str, Any]:
        """Deep-copied global conf with a rule's overrides applied.

        Mirrors mergeConfig (logtrics.go:71-105): forbidden keys error,
        unknown keys error, only OVERRIDABLE sections change.
        """
        out = copy.deepcopy(self.conf)
        if not overrides:
            return out
        for key, value in overrides.items():
            if key in FORBIDDEN:
                raise ConfigError(
                    f"config {key!r} can not be overridden at rule level"
                )
            if key not in OVERRIDABLE:
                raise ConfigError(f"invalid config key {key!r} at rule level")
            if isinstance(value, dict) and isinstance(out.get(key), dict):
                out[key].update(value)
            else:
                out[key] = value
        return out
