"""Multimodal columns: opaque binary payloads + typed metadata
(SURVEY.md §2.9).

Layout: media rows are ``(media_id BIGINT, kind STRING, payload BINARY,
meta STRUCT<...>)`` — the payload is opaque to Spark (image/audio/video
bytes); all engine-side operations are metadata extraction, partitioning,
and batch-shaped UDF plumbing. The actual decode (PIL/ffmpeg/soundfile) is
NOT available in this container, so the decode step is STUBBED: it raises
``NotImplementedError`` unless the optional library imports, with a
clearly-marked deterministic fake available for pipeline testing. The
Spark-side plumbing — schema, Arrow batching via mapInPandas, partition
shape — is real and tested.

Container check log (the gate is re-probed every round): PIL and ffmpeg
absent in the round-6, round-7 AND round-8 containers (also probed r8:
cv2, torchvision, soundfile, librosa, imageio — all absent;
``import PIL`` → ModuleNotFoundError, ``shutil.which("ffmpeg")`` →
None), so the real
decode paths stay environment-gated; if either ever appears, wire the
real path behind the same seam and keep the fake for tests.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<source:string, declared_bytes:bigint>"
)

META_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, sha256 string, "
    "sniffed_kind string"
)

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mp3"),
    (b"\x00\x00\x00", "video/mp4"),
]


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Wrap the documents fixture as media rows (utf-8 payload bytes) — the
    container has no binary fixtures, so text bytes stand in; every
    downstream op treats payload as opaque bytes either way."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.col("n_chars").cast("bigint").alias("declared_bytes"),
        ).alias("meta"),
    )


def extract_meta(media: DataFrame, batch_size: int = 1024) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads via
    mapInPandas: byte length, sha256 hex, magic-byte kind sniff.

    This is the canonical slow-path shape for multimodal work: columnar
    Arrow batches into pandas, vectorized python over the batch, columnar
    out. Never row-at-a-time.
    """

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            sha = payloads.map(
                lambda b: hashlib.sha256(b).hexdigest() if b is not None else ""
            )

            def sniff(b):
                if not b:
                    return "empty"
                for magic, kind in _MAGIC:
                    if bytes(b[: len(magic)]) == magic:
                        return kind
                return "application/octet-stream"

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "sha256": sha,
                    "sniffed_kind": payloads.map(sniff),
                }
            )

    return media.mapInPandas(_extract, schema=META_SCHEMA)


DECODED_IMAGE_SCHEMA = (
    "media_id bigint, width int, height int, n_channels int, ok boolean"
)


def decode_images(
    media: DataFrame, allow_fake: bool = False
) -> DataFrame:
    """Decode image payloads to (width, height, channels).

    STUB: real decode requires PIL, which is not installed in this
    container. With ``allow_fake=True`` a DETERMINISTIC FAKE derives fake
    dimensions from the payload's sha256 — pipeline plumbing (schema,
    batching, partitioning) is exercised for real; pixel decode is not.
    """

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        try:
            from PIL import Image  # noqa: F401
            import io

            have_pil = True
        except ImportError:
            have_pil = False

        for pdf in batches:
            if have_pil:
                def dims(b):
                    try:
                        im = Image.open(io.BytesIO(b))
                        return im.width, im.height, len(im.getbands()), True
                    except Exception:
                        return 0, 0, 0, False
            elif allow_fake:
                # DETERMINISTIC FAKE (clearly marked): dimensions from the
                # content hash — stable, content-addressed, not real pixels.
                def dims(b):
                    h = hashlib.sha256(b or b"").digest()
                    return (
                        64 + h[0] % 192,
                        64 + h[1] % 192,
                        1 + h[2] % 4,
                        True,
                    )
            else:
                raise NotImplementedError(
                    "image decode requires PIL (not in this container); "
                    "pass allow_fake=True for the deterministic fake"
                )
            rows = [dims(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "n_channels": [r[2] for r in rows],
                    "ok": [r[3] for r in rows],
                }
            )

    return media.mapInPandas(_decode, schema=DECODED_IMAGE_SCHEMA)


FRAME_SAMPLE_SCHEMA = "media_id bigint, frame_idx int, frame_sha256 string"


def sample_frames(
    media: DataFrame, every_n: int = 10, allow_fake: bool = False
) -> DataFrame:
    """Sample frames from video payloads.

    STUB: real frame extraction requires ffmpeg/av (absent here). The
    deterministic fake emits ``len(payload) // (1024 * every_n) + 1``
    pseudo-frames whose hashes chain off the content hash — exercising the
    one-to-many mapInPandas shape (one media row → N frame rows) for real.
    """

    def _sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        if not allow_fake:
            raise NotImplementedError(
                "video frame sampling requires ffmpeg/av (not in this "
                "container); pass allow_fake=True for the deterministic fake"
            )
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = b or b""
                n_frames = len(b) // (1024 * every_n) + 1
                h = hashlib.sha256(b).hexdigest()
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    shas.append(
                        hashlib.sha256(f"{h}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_sha256": shas}
            )

    return media.mapInPandas(_sample, schema=FRAME_SAMPLE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id bigint, out_width int, out_height int, resized_sha256 string"
)


def resize_images(
    media: DataFrame,
    width: int = 224,
    height: int = 224,
    allow_fake: bool = False,
) -> DataFrame:
    """Resize image payloads to a fixed (width, height) — the standard
    normalization step before vision-model feature extraction.

    STUB like :func:`decode_images`: real resampling requires PIL (absent
    here); the deterministic fake content-addresses the "resized" bytes
    as sha256(payload_hash : WxH) so downstream joins/dedups over the
    resized column are exercised for real. One-to-one mapInPandas, Arrow
    batches, no row-at-a-time Python.
    """

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        try:
            import io

            from PIL import Image

            have_pil = True
        except ImportError:
            have_pil = False

        for pdf in batches:
            if have_pil:
                def rsha(b):
                    try:
                        im = Image.open(io.BytesIO(b)).resize((width, height))
                        return hashlib.sha256(im.tobytes()).hexdigest()
                    except Exception:
                        return ""
            elif allow_fake:
                def rsha(b):
                    h = hashlib.sha256(b or b"").hexdigest()
                    return hashlib.sha256(
                        f"{h}:{width}x{height}".encode()
                    ).hexdigest()
            else:
                raise NotImplementedError(
                    "image resize requires PIL (not in this container); "
                    "pass allow_fake=True for the deterministic fake"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": width,
                    "out_height": height,
                    "resized_sha256": pdf["payload"].map(rsha),
                }
            )

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def byte_histogram_features(
    media: DataFrame, n_buckets: int = 16
) -> DataFrame:
    """REAL feature extraction over opaque payload bytes (no optional
    deps): a normalized ``n_buckets``-bin byte-value histogram per media
    row — the content-signature feature used for corpus clustering and
    near-dup triage when no modality-specific decoder is available.
    numpy-vectorized per Arrow batch (one bincount per row over a
    frombuffer view — no Python loop over bytes). Returns (media_id,
    n_bytes, features ARRAY<DOUBLE> length ``n_buckets``).
    """
    if 256 % n_buckets != 0:
        raise ValueError("n_buckets must divide 256")
    schema = "media_id bigint, n_bytes bigint, features array<double>"

    def _feat(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        width = 256 // n_buckets

        def hist(b):
            if not b:
                return [0.0] * n_buckets
            arr = np.frombuffer(bytes(b), dtype=np.uint8) // width
            counts = np.bincount(arr, minlength=n_buckets).astype("float64")
            return list(counts / counts.sum())

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "features": pdf["payload"].map(hist),
                }
            )

    return media.mapInPandas(_feat, schema=schema)
