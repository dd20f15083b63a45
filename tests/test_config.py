"""Config loader tests (pkg/config/config.go Loader + dotenv.go parity:
env defaults, .env override layering, collect-all validation)."""

import pytest

from jira_cdc_git_spark import config as C

GOOD = {
    "JIRA_BASE_URL": "https://jira.example.com",
    "JIRA_EMAIL": "dev@example.com",
    "JIRA_PAT": "0123456789abcdef",
}


def test_defaults_applied(tmp_path):
    cfg = C.load_config(env=GOOD)
    assert cfg.rate_limit_delay_ms == 100
    assert cfg.max_concurrent_requests == 5
    assert cfg.backoff_base_ms == 1_000
    assert cfg.max_backoff_ms == 30_000
    assert cfg.log_level == "info" and cfg.log_format == "text"


def test_env_overrides_and_malformed_fallbacks():
    cfg = C.load_config(
        env={
            **GOOD,
            "RATE_LIMIT_DELAY": "250ms",
            "MAX_CONCURRENT_REQUESTS": "8",
            "EXPONENTIAL_BACKOFF_BASE": "2s",
            "MAX_BACKOFF_DELAY": "1m",
            "LOG_LEVEL": "debug",
            "LOG_FORMAT": "json",
        }
    )
    assert cfg.rate_limit_delay_ms == 250
    assert cfg.max_concurrent_requests == 8
    assert cfg.backoff_base_ms == 2_000
    assert cfg.max_backoff_ms == 60_000
    # malformed duration/int fall back to defaults, not errors
    # (getDurationWithDefault semantics)
    cfg = C.load_config(
        env={**GOOD, "RATE_LIMIT_DELAY": "soon",
             "MAX_CONCURRENT_REQUESTS": "many"}
    )
    assert cfg.rate_limit_delay_ms == 100
    assert cfg.max_concurrent_requests == 5


def test_dotenv_files_override_env_in_order(tmp_path):
    f1 = tmp_path / "a.env"
    f1.write_text(
        "# comment\nexport JIRA_EMAIL=file1@example.com\n"
        "RATE_LIMIT_DELAY='300ms'\n"
    )
    f2 = tmp_path / "b.env"
    f2.write_text('JIRA_EMAIL="file2@example.com"\n')
    cfg = C.load_config(
        env={**GOOD, "JIRA_EMAIL": "env@example.com"},
        env_files=(str(f1), str(f2), str(tmp_path / "missing.env")),
    )
    # .env overrides env; later files win; missing files skipped
    assert cfg.jira_email == "file2@example.com"
    assert cfg.rate_limit_delay_ms == 300


def test_validation_collects_every_error():
    with pytest.raises(C.ConfigValidationError) as ei:
        C.load_config(
            env={
                "JIRA_BASE_URL": "ftp://host",
                "JIRA_EMAIL": "no-at-sign",
                "JIRA_PAT": "short",
                "EXPONENTIAL_BACKOFF_BASE": "1m",
                "MAX_BACKOFF_DELAY": "1s",
                "LOG_LEVEL": "loud",
                "LOG_FORMAT": "xml",
            }
        )
    msgs = "\n".join(ei.value.errors)
    for frag in (
        "http or https scheme",
        "must contain @ symbol",
        "at least 10 characters",
        "greater than or equal to EXPONENTIAL_BACKOFF_BASE",
        "LOG_LEVEL is invalid",
        "LOG_FORMAT is invalid",
    ):
        assert frag in msgs
    assert len(ei.value.errors) == 6


def test_missing_required_fields():
    with pytest.raises(C.ConfigValidationError) as ei:
        C.load_config(env={})
    assert {
        "JIRA_BASE_URL is required",
        "JIRA_EMAIL is required",
        "JIRA_PAT is required",
    } <= set(ei.value.errors)


def test_rate_limiter_wiring():
    cfg = C.load_config(
        env={**GOOD, "RATE_LIMIT_DELAY": "50ms",
             "EXPONENTIAL_BACKOFF_BASE": "500ms",
             "MAX_BACKOFF_DELAY": "5s"}
    )
    lim = C.rate_limiter_from_config(cfg)
    assert lim.delay_ms == 50
    assert lim.base_ms == 500
    assert lim.cap_ms == 5_000
