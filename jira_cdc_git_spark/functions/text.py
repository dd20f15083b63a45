"""Text scalar-function library (extension surface + SURVEY §2.7 string
functions). All Column-returning, built-ins only — no Python UDFs in the
hot path. Deterministic, so every function is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small latin-stopword set used by quality scoring / language heuristics;
# deterministic and tiny on purpose (oracle-expressible).
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the `parseIssueList` split/trim shape,
    internal/cli/sync.go:365-424, generalized to documents)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles. Empty array when the doc has < n
    tokens. Pure built-ins: transform over an index sequence + slice."""
    toks = tokens(text)
    raw = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, raw).otherwise(F.array().cast("array<string>"))
    )


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return stop / F.size(toks)


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    return F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
    ) / F.size(toks)


def normalize(text: Column) -> Column:
    """Lowercase + collapse whitespace — the shared normalization step of
    every fingerprint/shingle family here."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def char_shingles(text: Column, n: int = 5, stride: int = 1) -> Column:
    """Distinct character n-grams of the normalized text (the finer-grained
    shingle family for n-gram Jaccard dedup; word shingles miss
    near-dups that differ by small intra-word edits). stride > 1 samples
    every stride-th position — overlapping n-grams are highly redundant,
    so Jaccard over the sampled set preserves the similarity ordering at
    1/stride the hashing cost."""
    t = normalize(text)
    raw = F.transform(
        F.sequence(F.lit(1), F.length(t) - (n - 1), F.lit(stride)),
        lambda i: F.substring(t, i, n),
    )
    return F.array_distinct(
        F.when(F.length(t) >= n, raw).otherwise(F.array().cast("array<string>"))
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are neither alphanumeric nor whitespace
    — a classic boilerplate/garbage signal in LLM-corpus quality scoring."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.length(text)


def round_half_up(col: Column, digits: int) -> Column:
    """floor(x·10^d + 0.5)/10^d — identical half-up rounding of the binary
    double in Spark AND DuckDB (Spark's F.round half-up-rounds the
    shortest-decimal repr instead; DuckDB rounds the binary value — they
    disagree one ulp from a .5 boundary)."""
    p = 10 ** digits
    return F.floor(col * p + F.lit(0.5)) / p


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized (lowercased,
    whitespace-collapsed) text — the SHA-256-checksum idea from
    pkg/state/manager.go:649-662, applied to document identity."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


#: modulus of the affine minhash family (Mersenne prime 2^31-1)
MINHASH_PRIME = 2147483647


def hex32(x: Column) -> Column:
    """First 8 hex chars of md5(x) as a BIGINT in [0, 2^32): ONE digest
    per element, from which the entire minhash family derives by affine
    arithmetic (minhash_ab) — 32 hash functions for the price of one
    md5. DuckDB mirror: ``(('0x' || substr(md5(x),1,8)))::BIGINT``."""
    return F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long")


def minhash_ab(seed: int) -> tuple[int, int]:
    """Deterministic per-seed affine params for h_s(x) = (a·x + b) mod p
    (Carter-Wegman universal hashing — the standard minhash family).
    a is odd and < 2^30 so a·x + b stays inside int64 for x < 2^32;
    the Knuth multiplier spreads consecutive seeds."""
    a = ((2654435761 * (seed + 1)) % (1 << 30)) | 1
    b = (40503 * (seed + 7)) % MINHASH_PRIME
    return a, b


def affine_min(xs: Column, seed: int) -> Column:
    """array_min of the seed-th affine hash over a pre-digested BIGINT
    array (see hex32) — the narrow per-row minhash with no repeated
    digesting."""
    a, b = minhash_ab(seed)

    # a/b bound via CLOSURE on purpose: a `lambda v, a=a, b=b:` has
    # arity 3 and F.transform silently treats ≥2-arg callables as the
    # (element, index) form — the constants would become the index
    # Column and every seed would degenerate to the same hash family.
    def _h(v: Column) -> Column:
        return (v * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)

    return F.array_min(F.transform(xs, _h))


def simhash64(text: Column) -> Column:
    """64-bit SimHash over whitespace tokens, built-ins only.

    Each token votes +1/-1 on 64 bit positions according to the bits of
    xxhash64(token); the signature bit is 1 where the sum is positive.
    ONE fold over the token hashes with a 64-wide accumulator array —
    every token is hashed exactly once and the array is traversed once
    (the earlier 64-separate-folds form re-evaluated the hash transform
    per bit position: 64× the hashing for the same result). Bit 63's
    shiftleft wraps to Long.MIN_VALUE, which is exactly the sign-bit
    pattern wanted."""
    toks = tokens(text)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    idx = F.sequence(F.lit(0), F.lit(63))
    # accumulator must be LONG: F.aggregate does not coerce the zero
    # element, and the vote arithmetic yields BIGINT (xxhash64 is 64-bit).
    zero = F.array_repeat(F.lit(0).cast("long"), 64)
    sums = F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                idx,
                # F.shiftright's python arg must be a literal int; the SQL
                # function takes a column — call it by name
                lambda j: F.call_function("shiftright", h, j.cast("int"))
                .bitwiseAND(F.lit(1))
                * 2
                - 1,
            ),
            lambda a, v: a + v,
        ),
    )
    bits = F.zip_with(
        sums,
        idx,
        lambda s, j: F.when(
            s > 0,
            F.call_function("shiftleft", F.lit(1).cast("long"), j.cast("int")),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        bits, F.lit(0).cast("long"), lambda a, x: a.bitwiseOR(x)
    )


def affine_min_vec(xs: Column, n_hashes: int) -> Column:
    """All n_hashes affine minhashes in ONE fold over the pre-digested
    array: accumulator = n_hashes-wide vector of running minima, each
    lane applying its own (a, b) from minhash_ab. Numerically identical
    to [affine_min(xs, s) for s in range(n_hashes)] (same constants,
    same mod arithmetic) but traverses xs once instead of n_hashes
    times — the simhash64 single-fold lesson applied to minhash."""
    a_arr = F.array(
        *[F.lit(minhash_ab(s)[0]).cast("long") for s in range(n_hashes)]
    )
    b_arr = F.array(
        *[F.lit(minhash_ab(s)[1]).cast("long") for s in range(n_hashes)]
    )
    init = F.array_repeat(F.lit(MINHASH_PRIME).cast("long"), n_hashes)
    ab = F.zip_with(
        a_arr, b_arr, lambda a, b: F.struct(a.alias("a"), b.alias("b"))
    )
    folded = F.aggregate(
        xs,
        init,
        lambda acc, v: F.zip_with(
            acc,
            ab,
            lambda m, c: F.least(
                m, (v * c["a"] + c["b"]) % F.lit(MINHASH_PRIME)
            ),
        ),
    )
    # empty shingle set → NULL lanes, matching array_min(empty) = NULL in
    # the per-seed form (band keys of shingle-less docs must not collide
    # on a fold-identity value)
    return F.when(F.size(xs) > 0, folded).otherwise(
        F.array_repeat(F.lit(None).cast("long"), n_hashes)
    )
