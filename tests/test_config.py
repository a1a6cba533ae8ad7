import pytest

from logtrics_spark.config import ConfigError, EngineConfig


def test_rule_override_merges_sections():
    c = EngineConfig()
    m = c.merged({"graphite": {"interval": 10}, "expression": r"(?P<x>\d+)"})
    assert m["graphite"]["interval"] == 10
    assert m["graphite"]["tiers"] == ["1m", "5m", "1h", "1d"]  # untouched
    assert m["expression"] == r"(?P<x>\d+)"
    # deep copy: the global conf is never mutated (logtrics.go:71-79)
    assert c.conf["graphite"]["interval"] == 30


def test_forbidden_keys_error():
    c = EngineConfig()
    for key in ["scriptfile", "scriptdir", "mode", "tcp", "udp"]:
        with pytest.raises(ConfigError, match="can not be overridden"):
            c.merged({key: "x"})


def test_unknown_keys_error():
    with pytest.raises(ConfigError, match="invalid config key"):
        EngineConfig().merged({"grahpite": {}})
