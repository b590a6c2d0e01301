"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The Spark-side design is real and tested — schemas, partition-sized
Arrow batches, UDF signatures. The *codec* step is stubbed: this
container has no image/audio libraries, so ``decode_media`` ships a
deterministic fake decoder (and raises ``NotImplementedError`` for
``backend="real"``), clearly marked for swap-in of PIL/ffmpeg on a
real cluster.

Scale notes: media bytes never leave the executor; mapInPandas streams
Arrow batches, so peak memory is one batch (tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` for big blobs).
Metadata-only pipelines (filter by width/duration) should select the
metadata struct and let column pruning skip the binary entirely.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = ("media_type string, byte_size long, "
                     "content_hash string")


def attach_media_metadata(df: DataFrame, binary_col: str = "media",
                          media_type_col: str | None = None) -> DataFrame:
    """Typed metadata columns for an opaque binary column — pure
    expressions (no decode): size, content hash, declared type."""
    mt = (F.col(media_type_col) if media_type_col
          else F.lit("application/octet-stream"))
    return df.withColumn(
        "media_meta",
        F.struct(mt.alias("media_type"),
                 F.length(F.col(binary_col)).cast("long").alias("byte_size"),
                 F.md5(F.col(binary_col)).alias("content_hash")))


def _fake_decode(data: bytes) -> dict:
    """Deterministic stand-in for a real codec: derives stable pseudo
    dimensions/duration from the bytes so downstream plumbing (schema,
    filters, joins) is fully exercisable without PIL/ffmpeg."""
    h = int.from_bytes(data[:8].ljust(8, b"\0"), "little")
    return {"width": 16 + h % 4096, "height": 16 + (h >> 12) % 4096,
            "n_frames": 1 + (h >> 24) % 300,
            "duration_s": float((h >> 32) % 3600) / 10.0}


DECODED_SCHEMA = ("width int, height int, n_frames int, duration_s double")


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


def _parse_image_header(data: bytes) -> dict | None:
    """Pure-Python image header parse (no dependencies): PNG IHDR,
    JPEG SOF, GIF logical screen descriptor, BMP info header. Returns
    the DECODED_SCHEMA dict for recognized still images, None for
    anything else (caller falls back)."""
    if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n":
        return {"width": int.from_bytes(data[16:20], "big"),
                "height": int.from_bytes(data[20:24], "big"),
                "n_frames": 1, "duration_s": 0.0}
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        return {"width": int.from_bytes(data[6:8], "little"),
                "height": int.from_bytes(data[8:10], "little"),
                "n_frames": 1, "duration_s": 0.0}
    if len(data) >= 26 and data[:2] == b"BM":
        return {"width": int.from_bytes(data[18:22], "little", signed=True),
                "height": abs(int.from_bytes(data[22:26], "little",
                                             signed=True)),
                "n_frames": 1, "duration_s": 0.0}
    if len(data) >= 4 and data[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                break
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(data[i + 2:i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return {"width": int.from_bytes(data[i + 7:i + 9], "big"),
                        "height": int.from_bytes(data[i + 5:i + 7], "big"),
                        "n_frames": 1, "duration_s": 0.0}
            i += 2 + seg_len
    return None


def _parse_av_header(data: bytes) -> dict | None:
    """Pure-Python audio/video header parse (no dependencies): WAV
    (RIFF fmt/data chunks → sample-rate-exact duration) and MP4/ISO
    BMFF (moov/mvhd timescale+duration). Width/height stay 0 for
    audio; MP4 reports container duration without decoding frames."""
    # WAV: RIFF....WAVE then chunk walk
    if len(data) >= 44 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        i, byte_rate, data_size = 12, 0, 0
        while i + 8 <= len(data):
            cid = data[i:i + 4]
            clen = int.from_bytes(data[i + 4:i + 8], "little")
            if cid == b"fmt " and i + 16 + 8 <= len(data):
                byte_rate = int.from_bytes(data[i + 16:i + 20], "little")
            elif cid == b"data":
                data_size = clen
            i += 8 + clen + (clen & 1)
        if byte_rate > 0:
            return {"width": 0, "height": 0, "n_frames": 1,
                    "duration_s": round(data_size / byte_rate, 3)}
    # MP4 / ISO BMFF: top-level box walk to moov → mvhd
    if len(data) >= 12 and data[4:8] == b"ftyp":
        i = 0
        while i + 8 <= len(data):
            blen = int.from_bytes(data[i:i + 4], "big")
            btyp = data[i + 4:i + 8]
            if blen < 8:
                break
            if btyp == b"moov":
                j = i + 8
                while j + 8 <= min(i + blen, len(data)):
                    slen = int.from_bytes(data[j:j + 4], "big")
                    styp = data[j + 4:j + 8]
                    if styp == b"mvhd" and j + 8 + 20 <= len(data):
                        ver = data[j + 8]
                        if ver == 1:
                            ts = int.from_bytes(data[j + 28:j + 32], "big")
                            dur = int.from_bytes(data[j + 32:j + 40], "big")
                        else:
                            ts = int.from_bytes(data[j + 20:j + 24], "big")
                            dur = int.from_bytes(data[j + 24:j + 28], "big")
                        if ts > 0:
                            return {"width": 0, "height": 0, "n_frames": 1,
                                    "duration_s": round(dur / ts, 3)}
                    if slen < 8:
                        break
                    j += slen
            i += blen
    return None


def _pil_decode(data: bytes) -> dict | None:
    import io
    import PIL.Image
    try:
        with PIL.Image.open(io.BytesIO(data)) as img:
            return {"width": int(img.width), "height": int(img.height),
                    "n_frames": int(getattr(img, "n_frames", 1)),
                    "duration_s": 0.0}
    except Exception:
        return None


def decode_media(df: DataFrame, binary_col: str = "media",
                 backend: str = "auto") -> DataFrame:
    """Decode media headers to typed columns via mapInPandas.

    Backends:
    - ``"auto"`` (default) — PIL when importable (probed on the
      executor, per batch-iterator), else the dependency-free header
      parser (PNG/JPEG/GIF/BMP); unrecognized blobs fall back to the
      deterministic stub so the pipeline never throws mid-corpus.
    - ``"headers"`` — force the pure-Python parser (+stub fallback).
    - ``"stub"`` — deterministic fake only (fixture-friendly).
    - ``"real"`` — require PIL; raises ImportError where absent, and
      remains the marked extension point for av codecs (ffprobe)."""
    if backend not in ("auto", "headers", "stub", "real"):
        raise ValueError(backend)
    if backend == "real" and not _pil_available():
        raise NotImplementedError(
            "backend='real' requires PIL (and ffprobe for av) — not "
            "available in this container; use backend='auto' for the "
            "dependency-free header parser")
    passthrough = [c for c in df.columns if c != binary_col]
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name != binary_col)
    out_schema = out_schema + ", " + DECODED_SCHEMA

    def decode_one(data: bytes, use_pil: bool) -> dict:
        if backend != "stub":
            got = (_pil_decode(data) if use_pil
                   else _parse_image_header(data))
            if got is None and use_pil:
                got = _parse_image_header(data)
            if got is None:
                got = _parse_av_header(data)
            if got is not None:
                return got
            if backend == "real":
                raise ValueError("undecodable media row")
        return _fake_decode(data)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_pil = backend in ("auto", "real") and _pil_available()
        for pdf in batches:
            decoded = pd.DataFrame(
                [decode_one(b if b is not None else b"", use_pil)
                 for b in pdf[binary_col]])
            yield pd.concat(
                [pdf[passthrough].reset_index(drop=True), decoded], axis=1)

    return df.mapInPandas(run, out_schema)


def resize_media(df: DataFrame, width: int, height: int,
                 binary_col: str = "media",
                 backend: str = "stub") -> DataFrame:
    """Resize plumbing: mapInPandas binary→binary with target
    dimensions attached. The stub backend emits a deterministic
    transformation of the input bytes (length scales with the pixel
    ratio) so batch shapes, memory profile and schema are exercised;
    ``backend="real"`` is the PIL/ffmpeg extension point."""
    if backend == "real":
        raise NotImplementedError(
            "real resize (PIL/ffmpeg) not available in this container")
    passthrough = [c for c in df.columns if c != binary_col]
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name != binary_col)
    out_schema += f", `{binary_col}` binary, out_width int, out_height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                bytes((b or b"")[: max(1, (width * height) // 1024) or 1])
                for b in pdf[binary_col]]
            out = pdf[passthrough].reset_index(drop=True)
            out[binary_col] = resized
            out["out_width"] = width
            out["out_height"] = height
            yield out

    return df.mapInPandas(run, out_schema)


EMBED_DIM = 64


def extract_features(df: DataFrame, binary_col: str = "media",
                     out_col: str = "embedding",
                     backend: str = "stub") -> DataFrame:
    """Feature extraction: binary → unit-norm float vector (the
    embedding column the similarity ops consume — binary in, ANN-ready
    out). Stub backend derives a deterministic vector from the bytes;
    ``backend="real"`` is the model-inference extension point (batch
    the bytes through an ONNX/torch session here)."""
    if backend == "real":
        raise NotImplementedError(
            "real feature extraction (model inference) not available "
            "in this container")
    import numpy as np
    passthrough = [c for c in df.columns if c != binary_col]
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name != binary_col)
    out_schema += f", `{out_col}` array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for b in pdf[binary_col]:
                seed = int.from_bytes((b or b"\0")[:8].ljust(8, b"\0"),
                                      "little") % (2 ** 32)
                v = np.random.RandomState(seed).standard_normal(EMBED_DIM)
                vecs.append((v / np.linalg.norm(v)).astype("float32"))
            out = pdf[passthrough].reset_index(drop=True)
            out[out_col] = vecs
            yield out

    return df.mapInPandas(run, out_schema)


def sample_frames(df: DataFrame, every_n: int = 30,
                  frames_col: str = "n_frames") -> DataFrame:
    """Frame sampling plan for video rows: emits one row per sampled
    frame index (explode of a sequence — no decode needed to *plan*
    sampling; the actual pixel fetch is the decode_media extension
    point)."""
    idx = F.sequence(F.lit(0), F.greatest(F.col(frames_col) - 1, F.lit(0)),
                     F.lit(every_n))
    return df.withColumn("frame_index", F.explode(idx))
