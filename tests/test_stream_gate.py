"""Stream-gate calibration (VERDICT r4 item 2): the single-sample
classic-vs-streamed choice must follow MEASURED wall times when an
outcome calibration for this host/epoch exists, and fall back to the
dispatch-latency proxy only when the calibration is absent or stale
(dispatch latency drifted out of the recorded epoch class)."""

from __future__ import annotations

import json
import types

import bronko_tpu.call.engine as eng
from bronko_tpu.config import CallConfig


def _mk_cfg(tmp_path):
    return CallConfig(db="x", reads=["r.fastq"], output=str(tmp_path / "o"))


def _mk_dev():
    return types.SimpleNamespace(hist=object(), hist_words=None,
                                 fid_grouped=True)


def _patch_env(monkeypatch, tmp_path, dispatch_s, calib=None):
    """Pin the latency probe, point the calibration path into tmp, and
    make the native-lib check pass regardless of the build state."""
    monkeypatch.setattr(eng, "_DISPATCH_LAT", [dispatch_s])
    path = str(tmp_path / "stream_calib.json")
    monkeypatch.setattr(eng, "_STREAM_CALIB_PATH", path)
    import bronko_tpu.io.native as native

    monkeypatch.setattr(native, "get_lib", lambda: object())
    for var in ("BRONKO_STREAM", "BRONKO_NO_STREAM"):
        monkeypatch.delenv(var, raising=False)
    if calib is not None:
        import jax

        with open(path, "w") as fh:
            json.dump({jax.default_backend(): calib}, fh)
    return path


def test_calibration_overrides_latency_proxy(monkeypatch, tmp_path):
    # relay-class dispatch (35 ms) would proxy to classic, but the
    # measured calibration says streamed won in this epoch
    _patch_env(monkeypatch, tmp_path, 0.035, calib=dict(
        classic_s=0.649, streamed_s=0.530, dispatch_s=0.035, ts=0))
    assert eng._can_stream(_mk_cfg(tmp_path), _mk_dev(), None) is True


def test_calibration_classic_wins(monkeypatch, tmp_path):
    # fast dispatch would proxy to streamed, but the measurement says
    # classic was faster — outcome beats proxy in both directions
    _patch_env(monkeypatch, tmp_path, 0.001, calib=dict(
        classic_s=0.500, streamed_s=0.700, dispatch_s=0.001, ts=0))
    assert eng._can_stream(_mk_cfg(tmp_path), _mk_dev(), None) is False


def test_stale_calibration_falls_back_to_proxy(monkeypatch, tmp_path):
    # calibration taken at 1 ms dispatch; the live probe reads 35 ms —
    # different epoch class, so the proxy (35 ms >= 4 ms -> classic)
    # must decide even though the stale entry favoured streaming
    _patch_env(monkeypatch, tmp_path, 0.035, calib=dict(
        classic_s=0.9, streamed_s=0.4, dispatch_s=0.001, ts=0))
    assert eng._can_stream(_mk_cfg(tmp_path), _mk_dev(), None) is False


def test_no_calibration_uses_proxy(monkeypatch, tmp_path):
    _patch_env(monkeypatch, tmp_path, 0.001)
    assert eng._can_stream(_mk_cfg(tmp_path), _mk_dev(), None) is True
    monkeypatch.setattr(eng, "_DISPATCH_LAT", [0.035])
    assert eng._can_stream(_mk_cfg(tmp_path), _mk_dev(), None) is False


def test_env_overrides_beat_calibration(monkeypatch, tmp_path):
    _patch_env(monkeypatch, tmp_path, 0.035, calib=dict(
        classic_s=0.6, streamed_s=0.5, dispatch_s=0.035, ts=0))
    monkeypatch.setenv("BRONKO_NO_STREAM", "1")
    assert eng._can_stream(_mk_cfg(tmp_path), _mk_dev(), None) is False
    monkeypatch.delenv("BRONKO_NO_STREAM")
    monkeypatch.setenv("BRONKO_STREAM", "0")
    assert eng._can_stream(_mk_cfg(tmp_path), _mk_dev(), None) is False


def test_save_merges_platforms(monkeypatch, tmp_path):
    import jax

    path = _patch_env(monkeypatch, tmp_path, 0.02)
    with open(path, "w") as fh:
        json.dump({"other_backend": {"classic_s": 1, "streamed_s": 2,
                                     "dispatch_s": 0.001, "ts": 0}}, fh)
    entry = eng.save_stream_calibration(0.65, 0.53)
    d = json.load(open(path))
    assert "other_backend" in d                 # merge, not clobber
    assert d[jax.default_backend()]["classic_s"] == entry["classic_s"]
    # a freshly saved calibration must be immediately consumable
    assert eng._load_stream_calib() is not None
    assert eng._can_stream(_mk_cfg(tmp_path), _mk_dev(), None) is True


def test_corrupt_calibration_ignored(monkeypatch, tmp_path):
    path = _patch_env(monkeypatch, tmp_path, 0.035)
    with open(path, "w") as fh:
        fh.write("{not json")
    assert eng._load_stream_calib() is None
    assert eng._can_stream(_mk_cfg(tmp_path), _mk_dev(), None) is False
