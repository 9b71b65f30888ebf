"""DVAE_PLATFORM override (dvae_tpu/utils/platform.py): env var applied
via jax.config before backend init, no-op when unset, never raises."""

import os

import jax

from dvae_tpu.utils import apply_platform_override
from dvae_tpu.utils.platform import ENV_VAR


def test_unset_is_noop(monkeypatch):
    monkeypatch.delenv(ENV_VAR, raising=False)
    assert apply_platform_override() is None


def test_env_applied(monkeypatch):
    # the test env already runs on cpu (conftest), so applying "cpu" is
    # the idempotent, safe assertion of the wiring
    monkeypatch.setenv(ENV_VAR, "cpu")
    assert apply_platform_override() == "cpu"
    assert jax.config.jax_platforms == "cpu"
    assert jax.devices()[0].platform == "cpu"


def test_default_fallback(monkeypatch):
    monkeypatch.delenv(ENV_VAR, raising=False)
    assert apply_platform_override(default="cpu") == "cpu"


def test_whitespace_env_is_noop(monkeypatch):
    monkeypatch.setenv(ENV_VAR, "  ")
    assert apply_platform_override() is None
