"""Settings store tests — modeled on the reference's settings.rs tests
(settings.rs:227-360): defaults, round-trips, legacy/missing-field
migration, api_key omission, corrupt-file backup."""

import json

import pytest

from crispy_tpu.utils import settings


def test_defaults(data_root):
    f = settings.load_settings_file()
    assert f.llm.endpoint == "https://api.openai.com/v1"
    assert f.llm.model == "gpt-4"
    assert f.app.microphone_volume == "100"
    assert f.app.selected_model == "dummy"
    assert f.app.diarization_max_speakers == "6"


def test_roundtrip(data_root):
    f = settings.SettingsFile()
    f.llm.api_key = "sk-secret"
    f.app.selected_model = "rnnnoise"
    settings.save_settings_file(f)
    back = settings.load_settings_file()
    assert back.llm.api_key == "sk-secret"
    assert back.app.selected_model == "rnnnoise"


def test_update_app_setting(data_root):
    settings.update_app_setting("microphone_volume", "55")
    assert settings.load_app_settings().microphone_volume == "55"


def test_update_unknown_key_rejected(data_root):
    with pytest.raises(KeyError):
        settings.update_app_setting("not_a_key", "x")


def test_api_key_omitted_from_public(data_root):
    llm = settings.LlmSettings(api_key="sk-secret")
    settings.save_llm_settings(llm)
    pub = settings.get_llm_settings_public()
    assert "api_key" not in pub
    assert pub["endpoint"] == llm.endpoint


def test_missing_fields_defaulted(data_root):
    # Forward-compat: older file without the serde-defaulted keys
    path = settings.settings_file_path()
    path.write_text(json.dumps({
        "llm": {"endpoint": "e", "api_key": "k", "model": "m"},
        "app": {
            "selected_microphone": "mic",
            "selected_output_device": "out",
            "microphone_volume": "80",
            "selected_model": "dummy",
            "selected_transcription_model": "none",
            "selected_recording_app": "none",
        },
    }))
    f = settings.load_settings_file()
    assert f.app.selected_microphone == "mic"
    assert f.app.autostart_enabled == "false"
    assert f.app.diarization_merge_gap == "2.5"


def test_legacy_llm_only_file(data_root):
    path = settings.settings_file_path()
    path.write_text(json.dumps({"endpoint": "e", "api_key": "k", "model": "m"}))
    f = settings.load_settings_file()
    assert f.llm.endpoint == "e"
    assert f.app.selected_model == "dummy"


def test_corrupt_file_backed_up(data_root):
    path = settings.settings_file_path()
    path.write_text("{this is not json")
    f = settings.load_settings_file()
    assert f.app.selected_model == "dummy"  # defaults
    assert path.with_suffix(".json.corrupt").exists()
    assert not path.exists()


def test_concurrent_style_updates_do_not_clobber(data_root):
    settings.update_app_setting("selected_microphone", "a")
    settings.update_app_setting("selected_output_device", "b")
    app = settings.load_app_settings()
    assert app.selected_microphone == "a"
    assert app.selected_output_device == "b"
