"""Multimodal column handling: opaque binary payloads + typed metadata.

Design (BASELINE.json north star, "multimodal columns"): media travels as a
``binary`` column plus a metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions over
``mapInPandas`` so each partition processes media in vectorized batches and
the operator scales with input splits, never the driver.

The image/audio codec libraries are not in this container, so the *decode*
step is stubbed (clearly marked, deterministic); the Spark-side plumbing —
schema, partitioning, UDF signature, batch shape — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id BIGINT, payload BINARY, media_type STRING,"
    " meta STRUCT<source: STRING, declared_w: INT, declared_h: INT>"
)


def attach_fake_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Deterministic fake media table from a text column (test fixture):
    payload = utf-8 bytes, declared dims derived from the content hash."""
    payload = F.encode(F.col(text_col), "utf-8")
    h = F.conv(F.substring(F.md5(F.col(text_col)), 1, 6), 16, 10).cast("int")
    return df.select(
        # id type is preserved (bigint on the real tables; the scale
        # probe's synthetic corpus uses suffixed string ids)
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.struct(
            F.lit("synthetic").alias("source"),
            (h % 1920 + 1).alias("declared_w"),
            (F.shiftright(h, 8) % 1080 + 1).alias("declared_h"),
        ).alias("meta"),
    )


BYTE_STATS_SCHEMA = (
    "media_id BIGINT, n_bytes BIGINT, sha256 STRING, first_byte INT,"
    " last_byte INT"
)


def byte_stats(df: DataFrame) -> DataFrame:
    """Real (non-stub) per-payload byte statistics via mapInPandas —
    the shape every media feature-extractor follows."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                    "last_byte": payloads.map(lambda b: b[-1] if len(b) else -1),
                }
            )

    return df.mapInPandas(fn, BYTE_STATS_SCHEMA)


DECODED_SCHEMA = (
    "media_id BIGINT, width INT, height INT, channels INT, decoder STRING"
)


def decode_image(
    df: DataFrame, allow_stub: bool = True, force_stub: bool = False
) -> DataFrame:
    """Decode image payloads to (width, height, channels).

    Uses PIL when importable; otherwise a clearly-marked deterministic STUB
    (dims from the payload hash) so pipelines are testable in codec-less
    environments. The mapInPandas contract is identical either way.
    ``force_stub`` pins the stub even when PIL exists — used by the oracled
    pipeline-shape query, whose expected values are the stub's hash math.
    """
    if force_stub:
        has_pil = False
    else:
        try:
            from PIL import Image  # noqa: F401

            has_pil = True
        except ImportError:
            has_pil = False
    if not has_pil and not allow_stub:
        raise NotImplementedError("image decode requires PIL (not in container)")

    def fn(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        import io

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "channels": [],
                   "decoder": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if has_pil:
                    from PIL import Image

                    img = Image.open(io.BytesIO(bytes(payload)))
                    w, h = img.size
                    c = len(img.getbands())
                    dec = "pil"
                else:
                    # STUB decoder: deterministic pseudo-dims from content
                    d = hashlib.md5(bytes(payload)).digest()
                    w = int.from_bytes(d[0:2], "big") % 1920 + 1
                    h = int.from_bytes(d[2:4], "big") % 1080 + 1
                    c = 3
                    dec = "stub"
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["decoder"].append(dec)
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, DECODED_SCHEMA)


FRAME_SCHEMA = "media_id BIGINT, frame_idx INT, frame_sha STRING"


def frame_sample(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
                 ) -> DataFrame:
    """Video-style frame sampling STUB: treats the payload as a byte stream
    and emits one 'frame' fingerprint per ``every_n_bytes`` chunk (bounded
    by ``max_frames``). Real decoders drop in by replacing the chunker; the
    1->N row fan-out shape (flatMap) is the part that matters to Spark."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_sha": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                for idx in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    chunk = b[idx * every_n_bytes : (idx + 1) * every_n_bytes]
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["frame_sha"].append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, FRAME_SCHEMA)


AUDIO_FRAMES_SCHEMA = (
    "media_id BIGINT, frame_idx BIGINT, start BIGINT, n_samples INT,"
    " rms DOUBLE, peak INT"
)


def frame_audio(df: DataFrame, frame: int = 400, hop: int = 160) -> DataFrame:
    """Audio framing: treat the payload as 8-bit PCM and emit fixed-size
    analysis windows (default 400 samples / 160 hop — 25ms/10ms at 16kHz)
    with per-frame RMS and peak, the front half of every feature
    extractor (MFCC/fbank) and VAD gate.

    Real codec decode (wav/mp3) would replace ``np.frombuffer`` with the
    soundfile/librosa load — not in this container; the framing, stride
    math, and vectorized per-frame reduction ARE the production code.
    Frames are strictly full (trailing partial samples dropped), so output
    size is floor((n-frame)/hop)+1 rows per payload — deterministic and
    oracle-checkable. RMS = sqrt(mean(v^2)) in exact int64 sums -> one
    IEEE double division + sqrt, bit-identical cross-engine.
    """
    import numpy as np

    def fn(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "frame_idx": [],
                "start": [],
                "n_samples": [],
                "rms": [],
                "peak": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                    np.int64
                )
                n = len(buf)
                if n < frame:
                    continue
                n_frames = (n - frame) // hop + 1
                for i in range(n_frames):
                    win = buf[i * hop : i * hop + frame]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["start"].append(i * hop)
                    out["n_samples"].append(frame)
                    out["rms"].append(
                        float(np.sqrt(int((win * win).sum()) / frame))
                    )
                    out["peak"].append(int(win.max()))
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, AUDIO_FRAMES_SCHEMA)
