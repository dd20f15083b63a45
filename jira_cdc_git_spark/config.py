"""Environment configuration loader (reference: pkg/config/config.go
Loader.LoadFromEnv/Validate, pkg/config/dotenv.go DotEnvLoader).

The reference reads JIRA credentials + rate-limit tuning from env vars
with defaults (config.go:81-105), layered under optional .env files that
OVERRIDE the process environment (godotenv.Overload semantics,
dotenv.go:42-66), then validates the lot and reports EVERY violation at
once (config.go:108-161). Same shape here; the parsed result feeds
sources.jira_rest.RateLimiter directly.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

#: reference defaults (config.go:90-97, JCG-010)
DEFAULT_RATE_LIMIT_DELAY_MS = 100
DEFAULT_MAX_CONCURRENT = 5
DEFAULT_BACKOFF_BASE_MS = 1_000
DEFAULT_MAX_BACKOFF_MS = 30_000

_DURATION_RE = re.compile(r"^(\d+)(ms|s|m|h)$")
_DURATION_FACTOR = {"ms": 1, "s": 1_000, "m": 60_000, "h": 3_600_000}

_VALID_LOG_LEVELS = ("debug", "info", "warn", "error")
_VALID_LOG_FORMATS = ("text", "json")


class ConfigValidationError(ValueError):
    """configuration validation failed — carries EVERY violation
    (config.go:165-170 ValidationError)."""

    def __init__(self, errors: list[str]):
        self.errors = errors
        super().__init__(
            "configuration validation failed:\n  - " + "\n  - ".join(errors)
        )


@dataclass
class Config:
    jira_base_url: str = ""
    jira_email: str = ""
    jira_pat: str = ""
    rate_limit_delay_ms: int = DEFAULT_RATE_LIMIT_DELAY_MS
    max_concurrent_requests: int = DEFAULT_MAX_CONCURRENT
    backoff_base_ms: int = DEFAULT_BACKOFF_BASE_MS
    max_backoff_ms: int = DEFAULT_MAX_BACKOFF_MS
    log_level: str = "info"
    log_format: str = "text"


def _parse_env_file(path: str) -> dict[str, str]:
    """Minimal dotenv grammar: KEY=VALUE lines, # comments, optional
    single/double quotes, `export ` prefix tolerated."""
    out: dict[str, str] = {}
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            if line.startswith("export "):
                line = line[len("export "):]
            key, _, val = line.partition("=")
            key, val = key.strip(), val.strip()
            if len(val) >= 2 and val[0] == val[-1] and val[0] in "\"'":
                val = val[1:-1]
            if key:
                out[key] = val
    return out


def _duration_ms(value: str, default: int) -> int:
    """time.ParseDuration subset — malformed values fall back to the
    default (getDurationWithDefault, config.go:230-241)."""
    m = _DURATION_RE.match(value or "")
    if not m:
        return default
    return int(m.group(1)) * _DURATION_FACTOR[m.group(2)]


def _int_or(value: str, default: int) -> int:
    try:
        return int(value)
    except (TypeError, ValueError):
        return default


def load_config(
    env: dict[str, str] | None = None,
    env_files: tuple[str, ...] = (),
    validate: bool = True,
) -> Config:
    """Load + validate (Loader.LoadFromEnv + DotEnvLoader.Load):
    existing .env files are layered OVER the environment in order
    (godotenv.Overload — later files win), missing files are silently
    skipped; malformed numeric/duration values fall back to defaults;
    validation raises ConfigValidationError listing every violation."""
    merged = dict(os.environ if env is None else env)
    for path in env_files:
        if os.path.isfile(path):
            merged.update(_parse_env_file(path))

    g = merged.get
    cfg = Config(
        jira_base_url=g("JIRA_BASE_URL", "") or "",
        jira_email=g("JIRA_EMAIL", "") or "",
        jira_pat=g("JIRA_PAT", "") or "",
        rate_limit_delay_ms=_duration_ms(
            g("RATE_LIMIT_DELAY", ""), DEFAULT_RATE_LIMIT_DELAY_MS
        ),
        max_concurrent_requests=_int_or(
            g("MAX_CONCURRENT_REQUESTS", ""), DEFAULT_MAX_CONCURRENT
        ),
        backoff_base_ms=_duration_ms(
            g("EXPONENTIAL_BACKOFF_BASE", ""), DEFAULT_BACKOFF_BASE_MS
        ),
        max_backoff_ms=_duration_ms(
            g("MAX_BACKOFF_DELAY", ""), DEFAULT_MAX_BACKOFF_MS
        ),
        log_level=g("LOG_LEVEL", "") or "info",
        log_format=g("LOG_FORMAT", "") or "text",
    )
    if validate:
        validate_config(cfg)
    return cfg


def validate_config(cfg: Config) -> None:
    """Validate (config.go:108-161) — collects ALL errors."""
    errors: list[str] = []
    if not cfg.jira_base_url:
        errors.append("JIRA_BASE_URL is required")
    else:
        err = _url_error(cfg.jira_base_url)
        if err:
            errors.append(f"JIRA_BASE_URL is invalid: {err}")
    if not cfg.jira_email:
        errors.append("JIRA_EMAIL is required")
    else:
        err = _email_error(cfg.jira_email)
        if err:
            errors.append(f"JIRA_EMAIL is invalid: {err}")
    if not cfg.jira_pat:
        errors.append("JIRA_PAT is required")
    elif len(cfg.jira_pat) < 10:
        errors.append("JIRA_PAT must be at least 10 characters long")
    if cfg.rate_limit_delay_ms < 0:
        errors.append("RATE_LIMIT_DELAY must be non-negative")
    if cfg.max_concurrent_requests < 1:
        errors.append("MAX_CONCURRENT_REQUESTS must be at least 1")
    if cfg.backoff_base_ms < 0:
        errors.append("EXPONENTIAL_BACKOFF_BASE must be non-negative")
    if cfg.max_backoff_ms < 0:
        errors.append("MAX_BACKOFF_DELAY must be non-negative")
    if cfg.max_backoff_ms < cfg.backoff_base_ms:
        errors.append(
            "MAX_BACKOFF_DELAY must be greater than or equal to "
            "EXPONENTIAL_BACKOFF_BASE"
        )
    if cfg.log_level not in _VALID_LOG_LEVELS:
        errors.append(
            "LOG_LEVEL is invalid: must be one of: "
            + ", ".join(_VALID_LOG_LEVELS)
        )
    if cfg.log_format not in _VALID_LOG_FORMATS:
        errors.append(
            "LOG_FORMAT is invalid: must be one of: "
            + ", ".join(_VALID_LOG_FORMATS)
        )
    if errors:
        raise ConfigValidationError(errors)


def _url_error(url: str) -> str | None:
    from urllib.parse import urlparse

    try:
        u = urlparse(url)
    except ValueError as exc:
        return f"invalid URL format: {exc}"
    if u.scheme not in ("http", "https"):
        return "URL must use http or https scheme"
    if not u.netloc:
        return "URL must have a host"
    return None


def _email_error(email: str) -> str | None:
    parts = email.split("@")
    if len(parts) == 1:
        return "email must contain @ symbol"
    if len(parts) != 2:
        return "email must have exactly one @ symbol"
    if not parts[0] or not parts[1]:
        return "email must have both local and domain parts"
    return None


def rate_limiter_from_config(cfg: Config):
    """Wire the parsed tuning into the live limiter (the reference
    threads Config into NewAPIRateLimiter, ratelimit.go:52-66)."""
    from jira_cdc_git_spark.sources.jira_rest import RateLimiter

    return RateLimiter(
        delay_ms=cfg.rate_limit_delay_ms,
        base_ms=cfg.backoff_base_ms,
        cap_ms=cfg.max_backoff_ms,
    )
