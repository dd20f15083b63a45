"""Live JIRA REST source — the reference's front door re-expressed for Spark
(S2/S3 pagination: pkg/client/client.go:150-223; C10 rate limiting:
pkg/ratelimit/ratelimit.go:52-210, defaults pkg/config/config.go:20-23).

Shape of the adapter:

* **Fetch is I/O, parse is Spark.** The adapter only moves bytes: it pages
  ``/rest/api/2/search`` (``startAt += page_size`` until ``total``,
  client.go:159-191) under a token-delay rate limiter with 429 exponential
  backoff honoring ``Retry-After`` (ratelimit.go:150-210). Raw page
  payloads become a one-row-per-page DataFrame and ALL JSON parsing runs
  JVM-side via ``from_json`` + explode — no Python row loop over issues.
* **Two fetch modes.** ``search_issues`` pages from the driver (the
  reference's single-client behavior). ``search_issues_distributed`` does
  one probe request for ``total``, builds a page-offset DataFrame and
  fetches pages inside executors via ``mapInPandas``, repartitioned to
  ``max_concurrent`` tasks — the Spark restatement of the reference's
  5-way semaphore (ratelimit.go:52-210, config.go:20-23): global request
  concurrency == number of fetch partitions, each under its own token
  delay. This is the 100 TB-ingest shape: fetch parallelism is a first-
  class knob, and a 33k-issue backlog (client.go:149) is 330 page-tasks.
* **Quarantine posture.** Timestamps parse through the F4 multi-format
  fallback (+ the REST ``+0000`` offset form); unparseable rows carry NULL
  rather than a fabricated zero-time.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from jira_cdc_git_spark.functions.scalar import parse_jira_time

# reference defaults: 100 ms token delay, 5 concurrent, 1 s → 30 s backoff
DEFAULT_DELAY_MS = 100
DEFAULT_MAX_CONCURRENT = 5
BACKOFF_BASE_MS = 1000
BACKOFF_CAP_MS = 30000
PAGE_SIZE = 100  # client.go:160

#: conservative budget restored once a rate-limit window has reset
#: (ratelimit.go:107 — "Reset to conservative default").
BUDGET_RESET_DEFAULT = 1000
#: remaining-request level at which PROACTIVE pacing starts: below this,
#: the limiter stretches its inter-request delay to spread the leftover
#: budget across the time remaining in the window, so the budget lands
#: at ~0 exactly when the window resets instead of slamming into a 429
#: (the r7 verdict's "throttle near exhaustion" extension of the
#: reference's hard-stop-at-1 behavior, ratelimit.go:100-108).
BUDGET_SOFT_REMAINING = 10


class RateLimiter:
    """Token-delay limiter + 429 exponential backoff + X-RateLimit budget
    tracking (pkg/ratelimit/ratelimit.go:52-210). ``sleep``/``clock``/
    ``wallclock`` injectable for tests (budget resets are absolute unix
    times, so they compare against the wall clock, not the monotonic
    delay clock)."""

    def __init__(
        self,
        delay_ms: int = DEFAULT_DELAY_MS,
        base_ms: int = BACKOFF_BASE_MS,
        cap_ms: int = BACKOFF_CAP_MS,
        sleep: Callable[[float], None] = time.sleep,
        clock: Callable[[], float] = time.monotonic,
        wallclock: Callable[[], float] = time.time,
    ):
        self.delay_ms = delay_ms
        self.base_ms = base_ms
        self.cap_ms = cap_ms
        self._sleep = sleep
        self._clock = clock
        self._wall = wallclock
        self._last = None
        #: server-reported budget (X-RateLimit-Remaining / -Reset);
        #: None until the server sends the headers — header-less
        #: servers get pure token-delay behavior, unchanged.
        self.budget_remaining: int | None = None
        self.budget_reset_at: float | None = None

    def handle_response(self, headers) -> None:
        """Ingest X-RateLimit-Remaining / X-RateLimit-Reset budget
        headers from a response (ratelimit.go:150-163 HandleResponse);
        malformed values are ignored."""
        rem = headers.get("X-RateLimit-Remaining")
        if rem is not None:
            try:
                self.budget_remaining = int(rem)
            except ValueError:
                pass
        rst = headers.get("X-RateLimit-Reset")
        if rst is not None:
            try:
                self.budget_reset_at = float(rst)
            except ValueError:
                pass

    def _budget_wait_s(self) -> float:
        """Extra pre-request delay owed to the server-reported budget.

        * Exhausted (remaining <= 1) inside the window → wait out the
          window, then restore the conservative default
          (ratelimit.go:100-108).
        * Low (remaining <= BUDGET_SOFT_REMAINING) → pace: spread the
          remaining budget evenly across the rest of the window
          (window_left / remaining per request) so no request ever
          meets a 429 — proactive, where the reference only hard-stops
          at 1.
        """
        if self.budget_remaining is None or self.budget_reset_at is None:
            return 0.0
        window_left = self.budget_reset_at - self._wall()
        if window_left <= 0:
            # window already reset server-side
            self.budget_remaining = BUDGET_RESET_DEFAULT
            self.budget_reset_at = None
            return 0.0
        if self.budget_remaining <= 1:
            self.budget_remaining = BUDGET_RESET_DEFAULT
            self.budget_reset_at = None
            return window_left
        if self.budget_remaining <= BUDGET_SOFT_REMAINING:
            return window_left / self.budget_remaining
        return 0.0

    def wait(self) -> None:
        """Enforce the minimum inter-request delay (ratelimit.go:67-89),
        stretched by the budget pacing when the server reports a nearly
        exhausted window (ratelimit.go:100-108)."""
        budget_s = self._budget_wait_s()
        now = self._clock()
        floor_s = self.delay_ms / 1000.0
        if self._last is not None:
            remaining = max(floor_s, budget_s) - (now - self._last)
            if remaining > 0:
                self._sleep(remaining)
        elif budget_s > 0:
            self._sleep(budget_s)
        self._last = self._clock()

    def backoff(self, attempt: int, retry_after_s: float | None = None) -> None:
        """429 handling: honor Retry-After when present, else the capped
        exponential curve base·2^(n-1) (ratelimit.go:193-210)."""
        if retry_after_s is not None:
            self._sleep(retry_after_s)
            return
        ms = min(self.cap_ms, self.base_ms * 2 ** max(0, attempt - 1))
        self._sleep(ms / 1000.0)


def _http_get(url: str, token: str | None, timeout_s: float):
    req = urllib.request.Request(url)
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    req.add_header("Accept", "application/json")
    return urllib.request.urlopen(req, timeout=timeout_s)


def fetch_page(
    base_url: str,
    jql: str,
    start_at: int,
    page_size: int,
    limiter: RateLimiter,
    token: str | None = None,
    max_retries: int = 5,
    timeout_s: float = 30.0,
) -> str:
    """GET one search page as a raw JSON string, rate-limited, retrying 429
    with backoff (transport.go:29-105 behavior)."""
    qs = urllib.parse.urlencode(
        {"jql": jql, "startAt": start_at, "maxResults": page_size}
    )
    url = f"{base_url.rstrip('/')}/rest/api/2/search?{qs}"
    attempt = 0
    while True:
        limiter.wait()
        try:
            with _http_get(url, token, timeout_s) as resp:
                limiter.handle_response(resp.headers)
                return resp.read().decode("utf-8")
        except urllib.error.HTTPError as e:
            attempt += 1
            if e.code != 429 or attempt > max_retries:
                raise
            ra = e.headers.get("Retry-After")
            limiter.backoff(attempt, float(ra) if ra is not None else None)


def fetch_pages(
    base_url: str,
    jql: str,
    page_size: int = PAGE_SIZE,
    limiter: RateLimiter | None = None,
    token: str | None = None,
    max_retries: int = 5,
) -> Iterator[str]:
    """The startAt loop (client.go:159-191): yield raw page payloads until
    startAt + returned >= total."""
    limiter = limiter or RateLimiter()
    start = 0
    while True:
        payload = fetch_page(
            base_url, jql, start, page_size, limiter, token, max_retries
        )
        yield payload
        head = json.loads(payload)
        n = len(head.get("issues", []))
        if n == 0 or start + n >= head.get("total", 0):
            return
        start += page_size


# --- JVM-side parsing ------------------------------------------------------

# public JIRA REST v2 search-response shape (also asserted by the
# reference's test/api_validation_test.go response-shape suite)
RESPONSE_SCHEMA = """
    struct<
      startAt: int, maxResults: int, total: int,
      issues: array<struct<
        key: string,
        fields: struct<
          summary: string,
          description: string,
          status: struct<name: string,
                         statusCategory: struct<key: string>>,
          assignee: struct<displayName: string, emailAddress: string>,
          reporter: struct<displayName: string, emailAddress: string>,
          created: string,
          updated: string,
          priority: struct<name: string>,
          issuetype: struct<name: string>,
          project: struct<key: string>,
          parent: struct<key: string>,
          subtasks: array<struct<key: string>>,
          issuelinks: array<struct<
            type: struct<name: string>,
            outwardIssue: struct<key: string,
                                 fields: struct<summary: string>>,
            inwardIssue: struct<key: string,
                                fields: struct<summary: string>>>>,
          customfield_12311140: string
        >>>
    >
"""


def _rest_time(col: Column) -> Column:
    """REST timestamps: the F4 fallback list plus the +0000 offset layout
    real servers emit (client.go:293-300 formats to the 'Z' layout)."""
    return F.coalesce(
        parse_jira_time(col),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSZ")),
    )


def parse_search_payloads(payloads: DataFrame) -> DataFrame:
    """One row per raw page payload → the engine's `issues` schema
    (schemas.ISSUES). Pure JVM: from_json + explode + null-safe projection
    (P1, client.go:237-282) + link normalization (P4, client.go:365-397) +
    custom-field map (P2, client.go:340-349)."""
    iss = (
        payloads.select(
            F.explode(
                F.from_json(F.col("payload"), RESPONSE_SCHEMA)["issues"]
            ).alias("i")
        )
        .select(F.col("i.key").alias("key"), F.col("i.fields").alias("f"))
    )
    links = F.filter(
        F.transform(
            F.col("f.issuelinks"),
            lambda l: F.struct(
                F.coalesce(l["type"]["name"], F.lit("Relates")).alias("type"),
                F.when(l["outwardIssue"].isNotNull(), F.lit("outward"))
                .when(l["inwardIssue"].isNotNull(), F.lit("inward"))
                .alias("direction"),
                F.coalesce(
                    l["outwardIssue"]["key"], l["inwardIssue"]["key"]
                ).alias("issue_key"),
                F.coalesce(
                    l["outwardIssue"]["fields"]["summary"],
                    l["inwardIssue"]["fields"]["summary"],
                ).alias("summary"),
            ),
        ),
        lambda s: s["issue_key"].isNotNull(),
    )
    cf = F.map_filter(
        F.map_from_arrays(
            F.array(F.lit("customfield_12311140")),
            F.array(F.col("f.customfield_12311140")),
        ),
        lambda _, v: v.isNotNull(),
    )
    return iss.select(
        "key",
        F.coalesce(
            F.col("f.project.key"), F.regexp_extract("key", r"^(.*)-\d+$", 1)
        ).alias("project_key"),
        F.col("f.summary").alias("summary"),
        F.col("f.description").alias("description"),
        F.struct(
            F.coalesce(F.col("f.status.name"), F.lit("Unknown")).alias("name"),
            F.coalesce(
                F.col("f.status.statusCategory.key"), F.lit("indeterminate")
            ).alias("category"),
        ).alias("status"),
        F.when(
            F.col("f.assignee").isNotNull(),
            F.struct(
                F.col("f.assignee.displayName").alias("name"),
                F.col("f.assignee.emailAddress").alias("email"),
            ),
        ).alias("assignee"),
        F.when(
            F.col("f.reporter").isNotNull(),
            F.struct(
                F.col("f.reporter.displayName").alias("name"),
                F.col("f.reporter.emailAddress").alias("email"),
            ),
        ).alias("reporter"),
        _rest_time(F.col("f.created")).alias("created"),
        _rest_time(F.col("f.updated")).alias("updated"),
        F.col("f.priority.name").alias("priority"),
        F.coalesce(F.col("f.issuetype.name"), F.lit("Task")).alias("issuetype"),
        F.col("f.customfield_12311140").alias("epic_link"),
        F.col("f.parent.key").alias("parent_issue"),
        F.coalesce(
            F.transform(F.col("f.subtasks"), lambda s: s["key"]),
            F.array().cast("array<string>"),
        ).alias("subtasks"),
        F.coalesce(
            links,
            F.array().cast(
                "array<struct<type:string,direction:string,"
                "issue_key:string,summary:string>>"
            ),
        ).alias("issue_links"),
        cf.alias("custom_fields"),
    )


# --- entry points ----------------------------------------------------------

def search_issues(
    spark: SparkSession,
    base_url: str,
    jql: str,
    page_size: int = PAGE_SIZE,
    limiter: RateLimiter | None = None,
    token: str | None = None,
) -> DataFrame:
    """Driver-paged fetch (the reference's single-client loop) → parsed
    issues DataFrame."""
    pages = list(fetch_pages(base_url, jql, page_size, limiter, token))
    payloads = spark.createDataFrame(
        [(p,) for p in pages], "payload string"
    )
    return parse_search_payloads(payloads)


def search_issues_distributed(
    spark: SparkSession,
    base_url: str,
    jql: str,
    page_size: int = PAGE_SIZE,
    max_concurrent: int = DEFAULT_MAX_CONCURRENT,
    delay_ms: int = DEFAULT_DELAY_MS,
    token: str | None = None,
) -> DataFrame:
    """Executor-side page fetch: one probe request reads ``total``, then a
    page-offset DataFrame repartitioned to ``max_concurrent`` tasks fetches
    pages under per-task token delays — concurrency semantics of the
    reference's 5-way semaphore, scaled by a knob instead of a constant."""
    import pandas as pd  # noqa: F401  (worker-side)

    probe = json.loads(
        fetch_page(base_url, jql, 0, 0, RateLimiter(delay_ms), token)
    )
    total = probe.get("total", 0)
    if total <= 0:
        return parse_search_payloads(
            spark.createDataFrame([], "payload string")
        )
    starts = list(range(0, total, page_size))
    offsets = spark.createDataFrame(
        [(s,) for s in starts], "start_at int"
    ).repartition(min(max_concurrent, len(starts)))

    def _fetch(batches):
        limiter = RateLimiter(delay_ms)
        for pdf in batches:
            payloads = [
                fetch_page(base_url, jql, int(s), page_size, limiter, token)
                for s in pdf["start_at"]
            ]
            yield pd.DataFrame({"payload": payloads})

    # persist the raw pages: downstream multi-pass plans (sorts sample,
    # AQE re-plans) must NOT re-hit the API — one HTTP request per page,
    # recomputable from the source only on executor loss
    from pyspark.storagelevel import StorageLevel

    pages = offsets.mapInPandas(_fetch, "payload string").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    return parse_search_payloads(pages)


def search_query(
    spark: SparkSession,
    base_url: str,
    query,
    distributed: bool = False,
    **kw,
):
    """Predicate pushdown INTO the JIRA server — the reference's actual
    execution model (the JQL runs remotely; the client only pages,
    client.go:150-191). Accepts a raw JQL string or a parsed ``jql.Query``
    AST, runs it through ``optimize_query`` (project-conjunct-first +
    deterministic ORDER BY — exactly what BuildEpicQuery/OptimizeQuery do
    before every push, jira_builder.go:195-234), and fetches through the
    rate-limited reader. One AST drives both backends: ``jql.run_jql``
    filters parquet tables locally, ``search_query`` ships the same query
    to a live server."""
    from jira_cdc_git_spark import jql as _jql

    jql_str = _jql.emit(query) if isinstance(query, _jql.Query) else query
    optimized, _notes = _jql.optimize_query(jql_str)
    fetch = search_issues_distributed if distributed else search_issues
    return fetch(spark, base_url, optimized, **kw)
