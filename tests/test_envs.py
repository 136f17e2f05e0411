"""Central env registry (kvcompress_tpu/envs.py; reference vllm/envs.py):
typed lazy access, defaults, and live re-reads."""

import pytest

from kvcompress_tpu import envs


def test_defaults(monkeypatch):
    monkeypatch.delenv("KVC_PROFILE", raising=False)
    monkeypatch.delenv("KVC_HBM_BYTES", raising=False)
    assert envs.KVC_PROFILE is False
    assert envs.KVC_HBM_BYTES == 16 << 30
    assert envs.KVC_TOKENIZER_POOL_SIZE == 0


def test_lazy_reread_and_types(monkeypatch):
    monkeypatch.setenv("KVC_PROFILE", "1")
    assert envs.KVC_PROFILE is True
    monkeypatch.setenv("KVC_PROFILE", "0")
    assert envs.KVC_PROFILE is False
    monkeypatch.setenv("KVC_HBM_BYTES", str(8 << 30))
    assert envs.KVC_HBM_BYTES == 8 << 30
    monkeypatch.setenv("KVC_TEST_ARTIFICIAL_PREEMPT_RATE", "0.25")
    assert envs.KVC_TEST_ARTIFICIAL_PREEMPT_RATE == 0.25


def test_bad_value_falls_back_to_default(monkeypatch):
    monkeypatch.setenv("KVC_HBM_BYTES", "not-a-number")
    assert envs.KVC_HBM_BYTES == 16 << 30


def test_unknown_name_raises():
    with pytest.raises(AttributeError):
        envs.KVC_DOES_NOT_EXIST


def test_document_lists_every_knob():
    doc = envs.document()
    for name in dir(envs):
        assert name in doc
