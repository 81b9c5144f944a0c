"""The bench recorder refuses same-key writes with different settings
(VERDICT r4 #1c: the round-4f `--key r4f_select` collision silently
destroyed the P=256 headline row)."""

import json

import pytest

from splade_tpu.benchmark.record import (KeyCollisionError, record_row,
                                         settings_of)


def row(P, recall, qps):
    return {"metric": "postings_recall@10", "n_postings": P,
            "rescore_candidates": 1000, "recall": recall, "qps": qps,
            "device": "cpu"}


def test_new_key_and_rewrite_same_settings(tmp_path):
    out = tmp_path / "bench.json"
    record_row(out, "a_p256", row(256, 0.89, 5000))
    # re-measuring the same configuration updates in place
    record_row(out, "a_p256", row(256, 0.90, 5200))
    data = json.loads(out.read_text())
    assert data["a_p256"]["recall"] == 0.90


def test_different_settings_refused(tmp_path):
    out = tmp_path / "bench.json"
    record_row(out, "a_select", row(256, 0.89, 5000))
    with pytest.raises(KeyCollisionError, match="n_postings"):
        record_row(out, "a_select", row(512, 0.90, 6500))
    # the original row is intact
    assert json.loads(out.read_text())["a_select"]["n_postings"] == 256
    # force overwrites explicitly
    record_row(out, "a_select", row(512, 0.90, 6500), force=True)
    assert json.loads(out.read_text())["a_select"]["n_postings"] == 512


def test_measurement_fields_not_settings():
    s = settings_of(row(256, 0.9, 1.0))
    assert "recall" not in s and "qps" not in s and "device" not in s
    assert s["n_postings"] == 256


def test_non_dict_legacy_value_overwritable(tmp_path):
    out = tmp_path / "bench.json"
    out.write_text(json.dumps({"note": "free-text"}))
    record_row(out, "note", row(64, 0.5, 1.0))  # no crash on legacy str
    assert json.loads(out.read_text())["note"]["n_postings"] == 64
