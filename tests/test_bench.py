"""Tests for bench.py's outage fallback (the driver runs bench.py at
round end; during a relay outage it must still emit one honest JSON line
rather than a stack trace)."""

import io
import json
import sys

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

import bench  # noqa: E402


class TestStaleFallback:
    def test_emits_lastgood_flagged_stale(self, tmp_path, capsys):
        rec = {"metric": "m", "value": 123.4, "unit": "u",
               "vs_baseline": 12.34}
        p = tmp_path / "lastgood.json"
        p.write_text(json.dumps(rec))
        assert bench.emit_stale_lastgood(str(p)) is True
        out = json.loads(capsys.readouterr().out.strip())
        assert out["value"] == 123.4
        assert out["stale"] is True
        assert "stale_reason" in out

    def test_missing_file_returns_false(self, tmp_path, capsys):
        assert bench.emit_stale_lastgood(str(tmp_path / "nope.json")) is False
        assert capsys.readouterr().out == ""

    def test_corrupt_file_returns_false(self, tmp_path, capsys):
        p = tmp_path / "bad.json"
        p.write_text("{not json")
        assert bench.emit_stale_lastgood(str(p)) is False
        assert capsys.readouterr().out == ""

    def test_committed_seed_record_is_valid(self, capsys):
        """The checked-in BENCH_LASTGOOD.json must parse and carry the
        driver-required fields."""
        assert bench.emit_stale_lastgood() is True
        out = json.loads(capsys.readouterr().out.strip())
        for key in ("metric", "value", "unit", "vs_baseline"):
            assert key in out
        assert out["stale"] is True
