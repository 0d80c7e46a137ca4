"""Crash-diagnostics + telemetry smoke tests."""
import json
import time

from omniswarm_tpu.utils.diagnostics import (
    install_crash_handler,
    install_hang_watchdog,
)
from omniswarm_tpu.utils.telemetry import Telemetry


def test_crash_handler_installs():
    install_crash_handler()           # must not raise
    import faulthandler

    assert faulthandler.is_enabled()


def test_watchdog_cancel():
    w = install_hang_watchdog(30.0)
    w.cancel()                        # no dump fired


def test_telemetry_scopes_and_counters(tmp_path):
    tm = Telemetry()
    with tm.scope("solve"):
        time.sleep(0.01)
    with tm.scope("solve"):
        time.sleep(0.005)
    tm.count("bytes_sent", 1024)
    tm.count("bytes_sent", 512)
    rep = tm.report()
    assert rep["timers"]["solve"]["count"] == 2
    assert rep["timers"]["solve"]["avg_ms"] >= 5
    assert rep["counters"]["bytes_sent"] == 1536
    path = tmp_path / "telemetry.json"
    tm.dump_json(str(path))
    assert json.load(open(path))["timers"]["solve"]["count"] == 2
    assert "solve" in tm.summary()
