"""`fs2t doctor` diagnostics (cli/doctor.py)."""


from fastspeech2_lightning_tpu.cli.doctor import (
    FAIL,
    OK,
    WARN,
    check_compile_cache,
    check_config,
    check_native,
    check_versions,
    probe_devices,
    run_doctor,
)


def test_static_checks_pass():
    assert check_versions()[0] == OK
    assert check_native()[0] in (OK, WARN)
    status, msg = check_compile_cache()
    assert status in (OK, WARN)


def test_probe_devices_cpu(monkeypatch):
    monkeypatch.setenv("FS2T_DOCTOR_PLATFORM", "cpu")
    status, msg = probe_devices(timeout_s=120.0)
    assert status == OK, msg
    assert "backend=cpu" in msg


def test_probe_devices_timeout(monkeypatch):
    """A hung device transport reports FAIL with remediation, not a hang."""
    import fastspeech2_lightning_tpu.cli.doctor as doc

    monkeypatch.setattr(
        doc, "_DEVICE_PROBE", "import time; time.sleep(60)"
    )
    status, msg = doc.probe_devices(timeout_s=1.0)
    assert status == FAIL
    assert "hung" in msg


def test_check_config_missing_artifacts(tmp_path):
    import yaml

    cfg = {
        "preprocessing": {"save_dir": str(tmp_path / "pre")},
        "training": {
            "training_filelist": str(tmp_path / "nope.psv"),
            "validation_filelist": str(tmp_path / "nope.psv"),
        },
    }
    p = tmp_path / "config.yaml"
    p.write_text(yaml.safe_dump(cfg))
    rows = check_config(p)
    by_name = {name: status for name, status, _ in rows}
    assert by_name["config"] == OK
    assert by_name["artifacts"] == WARN
    assert by_name["training_filelist"] == WARN


def test_run_doctor_exit_codes(tmp_path, monkeypatch):
    monkeypatch.setenv("FS2T_DOCTOR_PLATFORM", "cpu")
    lines = []
    rc = run_doctor(None, device_timeout_s=120.0, echo=lines.append)
    assert rc == 0
    assert any("devices" in ln for ln in lines)
    assert any("checks:" in ln for ln in lines)
