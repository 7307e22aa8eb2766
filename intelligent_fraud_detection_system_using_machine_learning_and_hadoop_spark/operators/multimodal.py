"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded / feature-extracted via Arrow-batched ``mapInPandas``.

Training-data-pipeline extension (BASELINE.json north star). Image
DIMENSIONS are real even without codec libraries: PNG/GIF/JPEG/BMP
container headers are parsed with stdlib ``struct``
(:func:`parse_image_header`); PIL is used when installed; only bytes
matching no known magic fall back to ``decode_image_stub``
(deterministic fake). PIXEL-level work is real for PNG everywhere
(VERDICT r17 item 7): the vendored pure-stdlib codec
(:mod:`.png_codec` — 8-bit grey/GA/RGB/RGBA, the five scanline
filters) decodes, nearest-neighbor-resamples, and re-encodes with no
PIL, so the resize leg's real path executes in the codec-less build
sandbox and is pinned by pytest on exact pixels. PIL, when present,
still takes precedence (every container format, better resample
kernels). Only non-PNG pixel work (JPEG decode, video frame
extraction) remains stubbed behind ``NotImplementedError`` — the
Spark-side plumbing is real and tested: binary columns, metadata
struct schema, mapInPandas batch shapes, partition-size control for
large blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema of a multimodal asset table: payload is opaque binary; all
#: engine-visible facts live in typed columns.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
    ]
)

DECODED_META_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake asset table from the documents testdata: the
    UTF-8 bytes of ``text`` stand in for an encoded image payload.

    Rebalanced to full parallelism on under-partitioned scans: every
    consumer (decode / resize / frame-sample) is a per-row mapInPandas
    over the payload, so scan partitioning — not data size — would
    otherwise bound the Arrow batch throughput."""
    from ..sources.readers import ensure_min_partitions

    return ensure_min_partitions(
        docs.select(
            F.col("doc_id").alias("asset_id"),
            F.lit("image").alias("modality"),
            F.encode("text", "UTF-8").alias("content"),
            F.lit("application/octet-stream").alias("mime"),
        )
    )


def with_binary_meta(assets: DataFrame) -> DataFrame:
    """JVM-side metadata over binary payloads — no Python needed for
    length/digest, so this column path survives any scale."""
    return assets.select(
        "asset_id",
        F.octet_length("content").cast("long").alias("byte_len"),
        F.sha2("content", 256).alias("sha256"),
    )


def _have_pil() -> bool:
    """Real-codec availability probe (import-gated: PIL isn't installed
    in every environment; everything degrades to the deterministic
    stubs when absent)."""
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def decode_image_stub(content: bytes) -> tuple[int, int]:
    """Deterministic fake decoder: derives a (width, height) from the
    payload bytes. The real-codec path (:func:`decode_image_dims`) is
    preferred automatically when PIL is installed AND the payload is a
    decodable image."""
    if not content:
        return (0, 0)
    w = 64 + (content[0] % 64) * 16
    h = 64 + (content[-1] % 64) * 16
    return (w, h)


def parse_image_header(content: bytes) -> tuple[int, int] | None:
    """True (width, height) from PNG/GIF/JPEG/BMP container headers via
    stdlib ``struct`` — no codec library needed. Returns None for bytes
    that match no known magic (e.g. the testdata's UTF-8 payloads), so
    callers can fall through to the deterministic stub.

    Formats are parsed from their public container specs: PNG IHDR
    (first chunk, big-endian u32 pair), GIF logical screen descriptor
    (little-endian u16 pair), BMP BITMAPINFOHEADER (little-endian i32
    pair), and JPEG SOFn marker scan (big-endian u16 height, width)."""
    import struct

    c = bytes(content)
    if len(c) >= 24 and c[:8] == b"\x89PNG\r\n\x1a\n" and c[12:16] == b"IHDR":
        w, h = struct.unpack(">II", c[16:24])
        return (int(w), int(h))
    if len(c) >= 10 and c[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", c[6:10])
        return (int(w), int(h))
    if len(c) >= 26 and c[:2] == b"BM":
        w, h = struct.unpack("<ii", c[18:26])
        return (int(w), abs(int(h)))
    if len(c) >= 4 and c[:2] == b"\xff\xd8":
        # scan segment markers for a start-of-frame (SOF0–SOF15, minus
        # the DHT/DAC/RST family C4/C8/CC which carry no dimensions)
        i = 2
        while i + 9 <= len(c):
            if c[i] != 0xFF:
                i += 1
                continue
            marker = c[i + 1]
            if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", c[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", c[i + 5 : i + 9])
                return (int(w), int(h))
            i += 2 + seg_len
    return None


def decode_image_dims(content: bytes) -> tuple[int, int]:
    """(width, height): PIL when available and the bytes decode, else a
    stdlib container-header parse (PNG/GIF/JPEG/BMP — real dims with no
    codec installed), else the deterministic stub — so pipelines behave
    identically in codec-less environments and oracles stay stable on
    the testdata payloads (UTF-8 text bytes, which match no magic)."""
    if _have_pil():
        try:
            import io

            from PIL import Image

            with Image.open(io.BytesIO(bytes(content))) as im:
                return (int(im.width), int(im.height))
        except Exception:
            pass  # not a decodable image → header parse / stub
    parsed = parse_image_header(content)
    if parsed is not None:
        return parsed
    return decode_image_stub(content)


def decode_assets(assets: DataFrame, real_codec: bool = False) -> DataFrame:
    """Batch decode via ``mapInPandas``: Arrow-batched binary in, typed
    metadata out. Column pruning still applies upstream (only
    asset_id/content reach Python); batch size is Arrow-controlled so
    large blobs don't blow executor memory.

    ``real_codec=True`` REQUIRES PIL (raises when absent); the default
    auto-path uses PIL per-payload when it can and the stub otherwise.
    """
    if real_codec and not _have_pil():
        raise NotImplementedError(
            "real_codec=True requires PIL, which is not installed in "
            "this environment; the default path auto-detects it"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            dims = [decode_image_dims(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "byte_len": [len(c) for c in pdf["content"]],
                    "sha256": [hashlib.sha256(c).hexdigest() for c in pdf["content"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return assets.select("asset_id", "content").mapInPandas(
        batches, schema=DECODED_META_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("content", T.BinaryType(), False),
    ]
)


def resize_assets(
    assets: DataFrame, max_side: int = 256, real_codec: bool = False
) -> DataFrame:
    """Image resize plumbing: binary in → (resized) binary + dims out,
    Arrow-batched. A decodable payload goes through a REAL decode →
    thumbnail → PNG re-encode: PIL when installed (any container
    format, antialiased resample), else the vendored pure-stdlib PNG
    codec (:mod:`.png_codec` — nearest-neighbor; VERDICT r17 item 7,
    so the real leg runs with no codec library installed). Only bytes
    neither path can decode take the stub, which scales the
    fake-decoded dims to fit ``max_side`` and truncates the payload
    proportionally — deterministic and schema-faithful either way.

    ``real_codec=True`` asserts NO payload takes the stub: a byte
    string neither PIL (if present) nor the PNG codec can decode
    raises ``ValueError`` inside the batch instead of degrading — the
    strict mode for corpora that are supposed to be all-image."""

    def _resize_real(c: bytes) -> tuple[int, int, bytes] | None:
        if _have_pil():
            try:
                import io

                from PIL import Image

                with Image.open(io.BytesIO(bytes(c))) as im:
                    im.thumbnail((max_side, max_side))
                    buf = io.BytesIO()
                    im.save(buf, format="PNG")
                    return (int(im.width), int(im.height), buf.getvalue())
            except Exception:
                pass  # fall through to the vendored codec
        try:
            from .png_codec import decode_png, encode_png, resize_nearest

            w, h, ch, px = decode_png(bytes(c))
            nw, nh, npx = resize_nearest(w, h, ch, px, max_side)
            return (nw, nh, encode_png(nw, nh, ch, npx))
        except ValueError:
            if real_codec:
                raise ValueError(
                    "real_codec=True but payload is not decodable by "
                    "PIL (absent or failed) or the vendored PNG codec"
                )
            return None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_w, out_h, out_c = [], [], []
            for c in pdf["content"]:
                real = _resize_real(c)
                if real is not None:
                    out_w.append(real[0])
                    out_h.append(real[1])
                    out_c.append(real[2])
                    continue
                w, h = decode_image_stub(c)
                scale = min(1.0, max_side / max(w, h, 1))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                keep = max(1, int(len(c) * scale * scale)) if c else 0
                out_w.append(nw)
                out_h.append(nh)
                out_c.append(bytes(c[:keep]))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": out_w,
                    "height": out_h,
                    "content": out_c,
                }
            )

    return assets.select("asset_id", "content").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(
    assets: DataFrame, every_ms: int = 1000, real_codec: bool = False
) -> DataFrame:
    """Video frame sampling plumbing: one binary in → N frame rows out
    (the 1→N explode shape every video pipeline needs). The stub treats
    the payload as a 'video' whose duration is proportional to its
    length and emits deterministic byte-slice 'frames'; swap for
    pyav/ffmpeg keyframe extraction when codecs are available."""
    if real_codec:
        raise NotImplementedError(
            "video codecs not available here; wire pyav frame iteration "
            "in this mapInPandas body"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, frames = [], [], [], []
            for aid, c in zip(pdf["asset_id"], pdf["content"]):
                n_frames = max(1, len(c) // 100)  # "duration" from length
                step = max(1, len(c) // n_frames)
                for i in range(n_frames):
                    ids.append(aid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(bytes(c[i * step : i * step + step]))
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "frame_idx": idxs,
                    "frame_ts_ms": tss,
                    "frame": frames,
                }
            )

    return assets.select("asset_id", "content").mapInPandas(
        batches, schema=FRAMES_SCHEMA
    )


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.DoubleType()), False),
    ]
)


def extract_features(assets: DataFrame, n_bins: int = 16) -> DataFrame:
    """Feature extraction over binary payloads: an L1-normalized
    ``n_bins`` byte histogram as the embedding (deterministic, codec-
    free — swap the body for a CLIP/CNN forward when models are
    available; the output contract feeds similarity.cosine_topk /
    dedup.embedding_cosine_dup_pairs unchanged)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        width = 256 // n_bins
        for pdf in it:
            embs = []
            for c in pdf["content"]:
                if len(c):
                    arr = np.frombuffer(bytes(c), dtype=np.uint8)
                    hist = np.bincount(arr // width, minlength=n_bins).astype(
                        np.float64
                    )
                    embs.append((hist / hist.sum()).tolist())
                else:
                    embs.append([0.0] * n_bins)
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "embedding": embs})

    return assets.select("asset_id", "content").mapInPandas(
        batches, schema=FEATURES_SCHEMA
    )
