"""Multimodal columns (extension brief): image/audio/video as opaque BINARY
columns with typed metadata, processed via Arrow-batched Pandas UDFs over
``mapInPandas``.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested. The codec step resolves AT RUNTIME inside
each executor's Python worker: if PIL imports, payloads are really decoded
(``decoder='pil'``); a payload PIL can't parse falls back per-row to a
DETERMINISTIC FAKE derived from the content hash (``decoder='pil-fallback'``,
``decode_ok=False``); with PIL absent (this container) every row takes the
fake path (``decoder='fake-deterministic'``). No branch raises — a decode
failure is data, not an exception (same quarantine posture as F4).

At 100 TB the media table is partitioned by (modality, date-ish bucket);
mapInPandas streams Arrow batches so peak executor memory is one batch of
binary payloads, not a partition — set maxRecordsPerBatch to bound it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jira_cdc_git_spark.sources.registry import load_table_spread

def _pil():  # runtime lookup so executors decide independently of the driver
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


_HAS_CODECS = _pil() is not None  # driver-side info only; workers re-check

MEDIA_SCHEMA = (
    "media_id bigint, modality string, mime string, content binary,"
    "meta struct<source:string, n_bytes:bigint>"
)

DECODED_SCHEMA = (
    "media_id bigint, modality string, width int, height int,"
    "n_channels int, decode_ok boolean, decoder string"
)

FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_hash string"


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a deterministic media table from `documents`: the text bytes
    stand in for an opaque payload; modality/mime cycle by doc_id. This is
    the ingest shape a real pipeline would read from object storage."""
    docs = load_table_spread(spark, "documents", sf_dir, "doc_id")
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    mime = (
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    content = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        mime.alias("mime"),
        content.alias("content"),
        F.struct(
            F.col("source").alias("source"),
            F.length(content).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: derive (width, height, channels)
    from the payload bytes. NOT a real decode — see module docstring."""
    import hashlib

    h = hashlib.md5(content).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, 1 + h[2] % 4


def _sniff_dimensions(content: bytes) -> tuple[int, int, int] | None:
    """(width, height, channels) from PNG/GIF/BMP/JPEG headers — pure
    struct reads, zero codec dependency (this is all a lazy ``Image.open``
    does for ``.size`` anyway). Returns None when no known magic matches;
    never raises."""
    import struct

    try:
        if (
            len(content) >= 26
            and content[:8] == b"\x89PNG\r\n\x1a\n"
            and content[12:16] == b"IHDR"
        ):
            w, h = struct.unpack(">II", content[16:24])
            ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(content[25], 3)
            return w, h, ch
        if len(content) >= 10 and content[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", content[6:10])
            return w, h, 3
        if len(content) >= 30 and content[:2] == b"BM":
            hdr = struct.unpack("<I", content[14:18])[0]
            if hdr >= 40:
                w, h = struct.unpack("<ii", content[18:26])
                bpp = struct.unpack("<H", content[28:30])[0]
                return w, abs(h), {32: 4, 24: 3}.get(bpp, 1)
        if len(content) >= 4 and content[:2] == b"\xff\xd8":
            i = 2
            while i + 9 < len(content) and content[i] == 0xFF:
                marker = content[i + 1]
                seg = struct.unpack(">H", content[i + 2 : i + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", content[i + 5 : i + 9])
                    return w, h, content[i + 9]
                i += 2 + seg
    except Exception:
        return None
    return None


def _decode_one(Image, content: bytes) -> tuple[int, int, int, bool, str]:
    """One payload → (width, height, channels, decode_ok, decoder). Never
    raises. Decoder ladder: PIL when importable → header sniffer (real
    metadata decode, no dependency) → deterministic fake flagged by name
    (and decode_ok=False when a real codec was expected to work)."""
    import io

    if Image is not None:
        try:
            img = Image.open(io.BytesIO(content))
            return img.size[0], img.size[1], len(img.getbands()), True, "pil"
        except Exception:
            pass
    sniffed = _sniff_dimensions(content)
    if sniffed is not None:
        return *sniffed, True, "header-sniff"
    w, h, ch = _fake_decode(content)
    if Image is None:
        return w, h, ch, True, "fake-deterministic"
    return w, h, ch, False, "pil-fallback"


def decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract pass over the image rows via mapInPandas
    (Arrow batches of binary payloads). Plumbing is real; the codec runs
    when PIL is importable in the worker, else the deterministic fake."""
    media = media_table(spark, sf_dir).filter(F.col("modality") == "image")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _pil()
        for pdf in batches:
            rows = [_decode_one(Image, bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "n_channels": [r[2] for r in rows],
                    "decode_ok": [r[3] for r in rows],
                    "decoder": [r[4] for r in rows],
                }
            )

    return media.mapInPandas(_decode, DECODED_SCHEMA)


def frame_sample(spark: SparkSession, sf_dir: str, every_n: int = 4) -> DataFrame:
    """Frame-sampling pass over video rows: yields one row per sampled
    frame (1 frame per `every_n` KB of payload as the deterministic
    stand-in for timestamps). Demonstrates the 1→N mapInPandas shape a
    real extractor uses."""
    media = media_table(spark, sf_dir).filter(F.col("modality") == "video")

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(b)
                n_frames = max(1, len(payload) // (every_n * 64))
                for i in range(n_frames):
                    chunk = payload[i * every_n * 64:(i + 1) * every_n * 64]
                    ids.append(mid)
                    idxs.append(i)
                    hashes.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_hash": hashes}
            )

    return media.mapInPandas(_sample, FRAME_SCHEMA)


RESIZED_SCHEMA = (
    "media_id bigint, width int, height int, target_w int, target_h int,"
    "resized_hash string"
)

AUDIO_FEATURES_SCHEMA = (
    "media_id bigint, n_samples bigint, mean_amp double, std_amp double,"
    "rms double"
)


def resize_image(
    spark: SparkSession, sf_dir: str, target_w: int = 64, target_h: int = 64
) -> DataFrame:
    """Resize pass over image rows (mapInPandas, 1→1). The geometry is real
    (aspect-preserving fit into target_w × target_h from the decoded dims);
    with PIL importable in the worker the pixel resample really runs
    (img.resize + hash of the resampled bytes); otherwise — or when a
    payload can't be parsed — the hash is computed over the source payload
    plus the target geometry (deterministic fake). Never raises."""
    media = media_table(spark, sf_dir).filter(F.col("modality") == "image")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import io

        Image = _pil()
        for pdf in batches:
            rows = {k: [] for k in
                    ("media_id", "width", "height", "target_w", "target_h",
                     "resized_hash")}
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(b)
                img = None
                if Image is not None:
                    try:
                        img = Image.open(io.BytesIO(payload))
                    except Exception:
                        img = None
                if img is not None:
                    w0, h0 = img.size
                else:
                    w0, h0 = (
                        _sniff_dimensions(payload) or _fake_decode(payload)
                    )[:2]
                scale = min(target_w / w0, target_h / h0)
                w, h = max(1, int(w0 * scale)), max(1, int(h0 * scale))
                if img is not None:
                    resized = img.resize((w, h))
                    digest = hashlib.md5(resized.tobytes()).hexdigest()
                else:
                    digest = hashlib.md5(
                        payload + f":{w}x{h}".encode()
                    ).hexdigest()
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["target_w"].append(target_w)
                rows["target_h"].append(target_h)
                rows["resized_hash"].append(digest)
            yield pd.DataFrame(rows)

    return media.mapInPandas(_resize, RESIZED_SCHEMA)


def audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extract pass over audio rows: byte-level amplitude stats
    (n_samples, mean, std, RMS) computed with REAL vectorized numpy over
    Arrow batches — the MFCC-shaped step of a real pipeline, minus the
    codec (raw bytes stand in for PCM samples)."""
    import numpy as np

    media = media_table(spark, sf_dir).filter(F.col("modality") == "audio")

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "n_samples", "mean_amp", "std_amp", "rms")}
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                samples = np.frombuffer(bytes(b), dtype=np.uint8).astype(
                    np.float64
                )
                out["media_id"].append(mid)
                out["n_samples"].append(len(samples))
                out["mean_amp"].append(float(samples.mean()))
                out["std_amp"].append(float(samples.std()))
                out["rms"].append(float(np.sqrt((samples**2).mean())))
            yield pd.DataFrame(out)

    return media.mapInPandas(_features, AUDIO_FEATURES_SCHEMA)


def media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-JVM metadata aggregation over the media table (no UDF): per
    modality, payload size stats — the triage query that runs BEFORE any
    expensive decode at 100 TB."""
    media = media_table(spark, sf_dir)
    return media.groupBy("modality").agg(
        F.count("*").alias("n"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.round(F.avg("meta.n_bytes"), 2).alias("avg_bytes"),
    )


PHASH_SCHEMA = "media_id bigint, dhash long, decoder string"


def _dhash_grid(content: bytes, Image) -> tuple[int, str]:
    """64-bit difference hash (dHash) of an image payload. With PIL the
    payload is really decoded, grayscaled and resized to 9x8; otherwise
    the FIRST 72 PAYLOAD BYTES stand in for the pixel grid (deterministic
    fake 'decode', flagged by decoder name). The fake is deliberately
    LOCALITY-PRESERVING — raw bytes, not a hash of them — so a
    near-identical payload still yields a near-identical dhash, which is
    the property the downstream Hamming banding exploits."""
    import io

    pixels = None
    decoder = "fake-deterministic"
    if Image is not None:
        try:
            img = Image.open(io.BytesIO(content)).convert("L").resize((9, 8))
            pixels = list(img.getdata())
            decoder = "pil"
        except Exception:
            decoder = "pil-fallback"
    if pixels is None:
        raw = (content or b"\x00") * (72 // max(1, len(content or b"\x00")) + 1)
        pixels = list(raw[:72])
    bits = 0
    for r in range(8):
        for c in range(8):
            if pixels[r * 9 + c] < pixels[r * 9 + c + 1]:
                bits |= 1 << (r * 8 + c)
    if bits >= 1 << 63:  # store as signed 64-bit (Spark LongType)
        bits -= 1 << 64
    return bits, decoder


def dhash_frame(media: DataFrame) -> DataFrame:
    """(media_id, content, ...) → (media_id, dhash, decoder) via one
    Arrow-batched mapInPandas pass. Shared by the batch pair operator and
    the streaming dedup twin (same body, same decoder ladder)."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _pil()
        for pdf in batches:
            out = [_dhash_grid(bytes(b), Image) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": [h for h, _ in out],
                    "decoder": [d for _, d in out],
                }
            )

    return media.mapInPandas(_hash, PHASH_SCHEMA)


def dhash_bands(sigs: DataFrame) -> DataFrame:
    """Explode a (media_id, dhash) frame into 8 Hamming-band rows — by
    pigeonhole, pairs within Hamming distance <= 6 share at least one
    8-bit band (d < bands), so a band equi-join is exact for that
    threshold."""
    band_exprs = [
        (
            F.shiftright(F.col("dhash"), 8 * i).bitwiseAND(F.lit(0xFF))
            + F.lit(i * 256)
        ).cast("long")
        for i in range(8)
    ]
    return sigs.select(
        "media_id", "dhash", F.explode(F.array(*band_exprs)).alias("band_key")
    )


def image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image 64-bit dHash via one Arrow-batched mapInPandas pass —
    the signature half of perceptual near-dup detection. Like the rest of
    the media family, the corpus unions in one clone per 10th image with
    a single perturbed payload byte (near-identical, NOT exact-equal), so
    the near-dup surface exists even on the synthetic corpus."""
    media = media_table(spark, sf_dir).filter(F.col("modality") == "image")
    clones = media.filter(F.col("media_id") % 30 == 0).select(
        (F.col("media_id") + 1_000_000).alias("media_id"),
        "modality",
        "mime",
        # flip one byte near the middle of the payload
        F.concat(
            F.substring("content", 1, 8),
            F.lit(b"\xff"),
            F.expr("substring(content, 10, octet_length(content) - 9)"),
        ).alias("content"),
        "meta",
    )
    return dhash_frame(media.unionByName(clones))


def phash_neardup_pairs(
    spark: SparkSession, sf_dir: str, max_hamming: int = 6
) -> DataFrame:
    """Perceptual near-duplicate image pairs: dHash signatures + the same
    exact Hamming banding as simhash_neardup_pairs, specialized to 8-bit
    bands — by pigeonhole a pair within Hamming distance 6 agrees on at
    least one of 8 bands (d < bands), so the band join loses nothing.

    100 TB shape: the codec pass is Arrow-batched mapInPandas (one batch
    of payloads in memory, never a partition); signatures are 8 bytes/row;
    the self-join keys on (band_idx, band_val) — never all-pairs; verify
    is a projection on the joined row (signatures are carried, no join
    back)."""
    from jira_cdc_git_spark.materialize import materialize

    sigs = materialize(image_dhash(spark, sf_dir).select("media_id", "dhash"))
    bands = dhash_bands(sigs)
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.dhash").bitwiseXOR(F.col("b.dhash"))).cast("int")
    return (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
