"""Multimodal (image/audio/video) column handling.

Design: media travel as opaque ``binary`` columns with a typed metadata
struct alongside (SURVEY 'multimodal columns' requirement).  Decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` — the Spark-side
plumbing (schemas, batch shapes, partitioning) is real and tested.

Two codec tiers:

* **Header metadata is REAL**: PNG (IHDR), JPEG (SOFn scan), GIF, BMP
  dimensions and WAV RIFF sample-rate / sample-count are parsed from the
  actual bytes with stdlib ``struct`` inside Arrow-batched pandas UDFs —
  no external image/audio library needed
  (``attach_image_metadata(decoder="header")``,
  ``attach_audio_metadata``, ``sniff_image_meta``, ``sniff_wav_meta``).
* **Pixel/sample decoding is OPPORTUNISTIC**: ``decoder="real"``
  try-imports the codec AT CALL TIME in the executor — images decode
  for real wherever the Pillow wheel exists (``_try_pil``), video
  demuxes wherever PyAV exists (``_try_pyav``), and WAV/PCM audio
  decodes for REAL with only stdlib ``wave`` + numpy
  (``_real_audio_features``), dependency-free.  Where the codec is
  absent (this container has no PIL/ffmpeg), image/video ``"real"``
  raises the documented NotImplementedError at the exact codec
  boundary; ``decoder="fake"`` always produces deterministic synthetic
  features so pipelines build and test end-to-end either way.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_DTYPE = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ],
)

AUDIO_META_DTYPE = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("codec", T.StringType()),
    ],
)

VIDEO_META_DTYPE = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
    ],
)


# ---------------------------------------------------------------------------
# Stdlib header codecs (real bytes, no PIL/ffmpeg)
# ---------------------------------------------------------------------------

def sniff_image_meta(data: Optional[bytes]) -> tuple:
    """Parse (width, height, format) from real image bytes using only
    stdlib ``struct``: PNG IHDR, JPEG SOFn marker walk, GIF logical
    screen descriptor, BMP info header.  Unknown/corrupt payloads yield
    (None, None, None) instead of raising — at 100 TB a bad file must
    not kill the stage."""
    if not data or len(data) < 10:
        return (None, None, None)
    try:
        # PNG: 8-byte signature, then IHDR chunk (len+type at 8..16,
        # width/height big-endian u32 at 16..24).
        if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
            if data[12:16] == b"IHDR":
                w, h = struct.unpack(">II", data[16:24])
                return (int(w), int(h), "png")
            return (None, None, "png")
        # GIF: 6-byte version, then width/height little-endian u16.
        if data[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", data[6:10])
            return (int(w), int(h), "gif")
        # BMP: 'BM', BITMAPINFOHEADER width/height at 18/22 (LE i32;
        # height may be negative for top-down rows).
        if data[:2] == b"BM" and len(data) >= 26:
            w, h = struct.unpack("<ii", data[18:26])
            return (int(w), abs(int(h)), "bmp")
        # JPEG: walk markers from offset 2 until a SOFn frame header
        # (C0-CF except C4/C8/CC): [len u16][precision u8][h u16][w u16].
        if data[:2] == b"\xff\xd8":
            i, n = 2, len(data)
            while i + 3 < n:
                if data[i] != 0xFF:
                    i += 1
                    continue
                marker = data[i + 1]
                if marker == 0xFF:  # fill byte
                    i += 1
                    continue
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone marker, no length
                    continue
                if i + 4 > n:
                    break
                seglen = struct.unpack(">H", data[i + 2 : i + 4])[0]
                if (
                    0xC0 <= marker <= 0xCF
                    and marker not in (0xC4, 0xC8, 0xCC)
                    and i + 9 <= n
                ):
                    h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                    return (int(w), int(h), "jpeg")
                i += 2 + seglen
            return (None, None, "jpeg")
    except Exception:
        return (None, None, None)
    return (None, None, None)


def sniff_wav_meta(data: Optional[bytes]) -> tuple:
    """Parse (sample_rate, n_samples, codec) from real WAV/RIFF bytes:
    walk the chunk list for ``fmt `` (sample rate, block align) and
    ``data`` (payload size → sample count).  Non-WAV/corrupt payloads
    yield (None, None, None)."""
    if not data or len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return (None, None, None)
    try:
        rate, block_align, data_size = None, None, None
        i, n = 12, len(data)
        while i + 8 <= n:
            cid = data[i : i + 4]
            csize = struct.unpack("<I", data[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 24 <= n:
                _fmt, _ch, rate, _br, block_align = struct.unpack(
                    "<HHIIH", data[i + 8 : i + 22],
                )
            elif cid == b"data":
                data_size = csize
            # chunks are word-aligned (odd sizes padded by one byte)
            i += 8 + csize + (csize & 1)
        n_samples = (
            data_size // block_align
            if data_size is not None and block_align
            else None
        )
        return (
            int(rate) if rate is not None else None,
            int(n_samples) if n_samples is not None else None,
            "wav",
        )
    except Exception:
        return (None, None, None)


def attach_image_metadata(
    df: DataFrame,
    binary_col: str,
    width=None,
    height=None,
    fmt="raw",
    decoder: str = "literal",
):
    """Attach a typed metadata struct next to a binary media column.

    ``decoder="literal"`` stamps caller-supplied width/height/format
    (cheap column expression, no byte inspection); ``decoder="header"``
    parses the REAL bytes (PNG/JPEG/GIF/BMP headers, stdlib-only) in an
    Arrow-batched pandas UDF — unparseable rows get null fields."""
    if decoder == "literal":
        return df.withColumn(
            f"{binary_col}_meta",
            F.struct(
                F.lit(width).cast("int").alias("width"),
                F.lit(height).cast("int").alias("height"),
                F.lit(fmt).alias("format"),
            ),
        )
    if decoder != "header":
        raise ValueError("decoder must be 'literal' or 'header'")

    @F.pandas_udf(IMAGE_META_DTYPE)
    def _img_meta(col: pd.Series) -> pd.DataFrame:
        metas = [sniff_image_meta(b) for b in col]
        return pd.DataFrame(
            {
                "width": pd.array([m[0] for m in metas], dtype="Int32"),
                "height": pd.array([m[1] for m in metas], dtype="Int32"),
                "format": [m[2] for m in metas],
            },
        )

    return df.withColumn(f"{binary_col}_meta", _img_meta(F.col(binary_col)))


def attach_audio_metadata(df: DataFrame, binary_col: str) -> DataFrame:
    """Attach (sample_rate, n_samples, codec) parsed from REAL WAV/RIFF
    bytes (stdlib-only, Arrow-batched); non-WAV rows get null fields."""

    @F.pandas_udf(AUDIO_META_DTYPE)
    def _wav_meta(col: pd.Series) -> pd.DataFrame:
        metas = [sniff_wav_meta(b) for b in col]
        return pd.DataFrame(
            {
                "sample_rate": pd.array([m[0] for m in metas], dtype="Int32"),
                "n_samples": pd.array([m[1] for m in metas], dtype="Int64"),
                "codec": [m[2] for m in metas],
            },
        )

    return df.withColumn(f"{binary_col}_meta", _wav_meta(F.col(binary_col)))


def _fake_decode(data: bytes, n: int = 16) -> list:
    """Deterministic stand-in for a codec: first-n byte histogram-ish
    features derived only from the payload bytes."""
    if data is None:
        return [0.0] * n
    arr = list(data[: 4 * n]) or [0]
    out = []
    for i in range(n):
        chunk = arr[i::n] or [0]
        out.append(float(sum(chunk) % 256) / 255.0)
    return out


def _try_pil():
    """Opportunistic codec import, evaluated AT CALL TIME inside the
    executor process: returns PIL's Image module when the wheel exists
    there, else None.  The same code therefore does real pixel decode
    on clusters that ship Pillow and degrades to the documented
    NotImplementedError in containers (like this one) that don't."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def _try_pyav():
    """Opportunistic PyAV import for the video demuxer boundary."""
    try:
        import av

        return av
    except ImportError:
        return None


def _real_image_features(data, n: int, Image) -> Optional[list]:
    """Real pixel features via a supplied PIL Image module: grayscale,
    resize to the smallest square grid covering ``n``, normalized
    intensities (pad with 0).  Corrupt/undecodable rows return None
    instead of raising — at 100 TB a bad file must not kill the stage."""
    if data is None:
        return None
    import io
    import math

    try:
        img = Image.open(io.BytesIO(bytes(data))).convert("L")
        side = max(1, int(math.ceil(math.sqrt(n))))
        img = img.resize((side, side))
        px = list(img.getdata())
        return [
            float(px[i]) / 255.0 if i < len(px) else 0.0 for i in range(n)
        ]
    except Exception:
        return None


def _real_audio_features(data, n: int) -> Optional[list]:
    """REAL sample-level audio features for WAV/PCM using only stdlib
    ``wave`` + numpy: decode the PCM payload, mix channels down, and
    return ``n`` per-segment RMS energies in [0, 1] — no external codec
    needed, so the 'real' tier genuinely works for WAV in this
    container.  Non-WAV / compressed / corrupt rows return None."""
    if data is None:
        return None
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(bytes(data))) as w:
            nch = w.getnchannels()
            sw = w.getsampwidth()
            raw = w.readframes(w.getnframes())
        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
        if dtype is None:
            return None
        x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
        if sw == 1:
            x = x - 128.0  # 8-bit WAV is unsigned
        x = x / float(2 ** (8 * sw - 1))
        if nch > 1 and x.size % nch == 0:
            x = x.reshape(-1, nch).mean(axis=1)
        if x.size == 0:
            return [0.0] * n
        return [
            float(np.sqrt(np.mean(s * s))) if s.size else 0.0
            for s in np.array_split(x, n)
        ]
    except Exception:
        return None


def image_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    n_features: int = 16,
    decoder: str = "fake",
) -> DataFrame:
    """Extract a fixed-size feature vector per image via Arrow-batched
    mapInPandas.  Schema: (id, features array<float>).
    ``decoder="real"`` uses Pillow when importable in the executor
    (grayscale-resize intensity grid; corrupt rows get NULL features)
    and raises the documented NotImplementedError where it isn't;
    ``decoder="fake"`` is the deterministic byte-derived stand-in."""
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ],
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # codec lookup at call time IN THE EXECUTOR: real decode wherever
        # the Pillow wheel exists, the documented stub error where not
        Image = _try_pil() if decoder == "real" else None
        for pdf in batches:
            if decoder == "real":
                if Image is None:
                    raise NotImplementedError(
                        "real image decode requires PIL/opencv — not "
                        "available in this container; plug the codec "
                        "call here",
                    )
                feats = [
                    _real_image_features(b, n_features, Image)
                    for b in pdf[binary_col]
                ]
            else:
                feats = [_fake_decode(b, n_features) for b in pdf[binary_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, binary_col).mapInPandas(extract, schema=schema)


def frame_sample(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    every_n: int = 10,
    decoder: str = "fake",
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame,
    (id, frame_idx, frame binary).  Fake decoder slices the payload into
    pseudo-frames; the real path raises at the codec boundary."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ],
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        av = _try_pyav() if decoder == "real" else None
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                if decoder == "real":
                    if av is None:
                        raise NotImplementedError(
                            "real video decode requires ffmpeg — plug the demuxer here",
                        )
                    import io

                    try:
                        with av.open(io.BytesIO(bytes(row[binary_col]))) as c:
                            for fi, frame in enumerate(c.decode(video=0)):
                                if fi % every_n == 0:
                                    ids.append(row[id_col])
                                    idxs.append(fi)
                                    frames.append(
                                        bytes(frame.to_ndarray().tobytes()),
                                    )
                    except Exception:
                        pass  # corrupt container: contribute no frames
                    continue
                data = row[binary_col] or b""
                n_pseudo_frames = max(1, len(data) // 64)
                for fi in range(0, n_pseudo_frames, every_n):
                    ids.append(row[id_col])
                    idxs.append(fi)
                    frames.append(bytes(data[fi * 64 : (fi + 1) * 64]))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, binary_col).mapInPandas(sample, schema=schema)


def audio_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    n_features: int = 8,
    decoder: str = "fake",
) -> DataFrame:
    """Audio feature extraction (same contract as image_features).
    ``decoder="real"`` genuinely decodes WAV/PCM payloads with stdlib
    ``wave`` and returns per-segment RMS energies; non-WAV/corrupt rows
    get NULL features.  ``decoder="fake"`` is the deterministic
    byte-derived stand-in."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ],
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                # WAV/PCM decodes for real with stdlib wave — no
                # external codec; non-WAV rows yield None features
                feats = [
                    _real_audio_features(b, n_features)
                    for b in pdf[binary_col]
                ]
            else:
                feats = [_fake_decode(b, n_features) for b in pdf[binary_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, binary_col).mapInPandas(extract, schema=schema)
