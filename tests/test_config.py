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


def test_load_toml_reference_shape(tmp_path):
    from logtrics_spark.config import ConfigError, load_toml

    good = tmp_path / "config.toml"
    good.write_text(
        """
modes = ["tcp", "file"]
scriptdir = "/etc/rules"
buffersize = 8

[graphite]
  debug = true
  host = "10.0.0.1"
  interval = 60
  port = 2024

[logging]
  level = "debug"
  type = "console"

[tcp]
  host = "0.0.0.0"
  port = 4003
"""
    )
    conf = load_toml(str(good))
    assert conf["modes"] == ["tcp", "file"]
    assert conf["buffer"]["size"] == 8
    # reference keys merged NEXT TO engine defaults in the same section
    assert conf["graphite"]["debug"] is True
    assert conf["graphite"]["interval"] == 60
    assert conf["graphite"]["tiers"] == ["1m", "5m", "1h", "1d"]
    assert conf["logging"]["level"] == "debug"
    assert conf["tcp"]["port"] == 4003

    bad_key = tmp_path / "bad1.toml"
    bad_key.write_text('wibble = 1\n')
    with pytest.raises(ConfigError, match="unknown config keys"):
        load_toml(str(bad_key))

    bad_mode = tmp_path / "bad2.toml"
    bad_mode.write_text('modes = ["carrier-pigeon"]\n')
    with pytest.raises(ConfigError, match="invalid modes"):
        load_toml(str(bad_mode))

    bad_level = tmp_path / "bad3.toml"
    bad_level.write_text('[logging]\nlevel = "shout"\n')
    with pytest.raises(ConfigError, match="invalid logging level"):
        load_toml(str(bad_level))
