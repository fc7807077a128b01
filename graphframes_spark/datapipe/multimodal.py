"""Multimodal columns: opaque binary payloads + typed metadata.

The storage contract for image/audio/video in a Spark-native training
pipeline: payload as a ``binary`` column, typed metadata in a sibling
struct (byte length, sha256 content hash, declared mime type). Compute
on the payload goes through ``mapInPandas`` — Arrow-batched, one Python
worker per partition, the only sane way to run a decoder at 100 TB
(per-row Python UDFs are 10-100x slower; JVM cannot host the codec).

The decode step itself is STUBBED here: image/audio codecs are not
available in this environment. ``extract_features`` takes any
``decoder: bytes -> list[float]``; the default ``fake_decoder`` is a
deterministic byte-histogram so the Spark-side plumbing — schema,
Arrow batch shape, partition mapping, column pruning — is real and
testable. Swap in PIL/ffmpeg by passing a real decoder.

Scale notes: binary payloads dominate row size — keep them in their own
parquet column (column pruning skips them unless touched), size
``spark.sql.files.maxPartitionBytes`` down (128 MB of 1 MB images = 128
rows/task is fine; 128 MB of 10 KB thumbnails = 13k decodes/task), and
never collect payloads to the driver.
"""

from __future__ import annotations

from typing import Callable, Iterator, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16


def binary_metadata(payload: Column, mime: Optional[Column] = None) -> Column:
    """Typed metadata struct for a binary payload column."""
    return F.struct(
        F.length(payload).alias("byte_len"),
        F.lower(F.sha2(payload, 256)).alias("sha256"),
        (mime if mime is not None else F.lit("application/octet-stream")).alias(
            "mime"
        ),
    )


def with_binary(
    df: DataFrame,
    source_col: str,
    payload_col: str = "payload",
    meta_col: str = "meta",
    mime: str = "text/plain",
) -> DataFrame:
    """Attach a binary payload (utf-8 encode of ``source_col`` — stand-in
    for real media bytes) plus its metadata struct."""
    payload = F.encode(F.col(source_col), "UTF-8")
    return df.withColumn(payload_col, payload).withColumn(
        meta_col, binary_metadata(F.col(payload_col), F.lit(mime))
    )


def fake_decoder(payload: bytes) -> List[float]:
    """Deterministic stand-in for a media decoder: 16-bin byte histogram,
    L1-normalized. Replace with a real codec (PIL, torchaudio, ffmpeg)
    in production — the pipeline shape does not change."""
    counts = [0] * FEATURE_DIM
    for b in payload:
        counts[b % FEATURE_DIM] += 1
    total = float(len(payload)) or 1.0
    return [c / total for c in counts]


def unavailable_decoder(payload: bytes) -> List[float]:
    """Explicit stub for codecs absent in this environment."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg/torchaudio) are not installed in this "
        "environment; pass a real decoder to extract_features()"
    )


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "id",
    feature_col: str = "features",
    decoder: Callable[[bytes], List[float]] = fake_decoder,
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    ``mapInPandas``: each partition streams in as pandas batches; only
    (id, payload) columns cross the JVM->Python boundary (column pruning
    keeps everything else JVM-side); output is (id, features:
    array<double>) to re-join narrow.
    """
    import pandas as pd

    schema = f"{id_col} long, {feature_col} array<double>"
    pruned = df.select(F.col(id_col).cast("long").alias(id_col), F.col(payload_col))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    feature_col: [decoder(bytes(p)) for p in pdf[payload_col]],
                }
            )

    return pruned.mapInPandas(run, schema=schema)


def pil_image_decoder(dim: int = FEATURE_DIM) -> Callable[[bytes], List[float]]:
    """Real image decoder adapter: PIL behind an optional import.

    Returns a ``bytes -> list[float]`` callable for
    :func:`extract_features`: decode, convert to 8-bit grayscale, and
    emit an L1-normalized ``dim``-bin intensity histogram — deterministic
    for a given payload, any raster format PIL reads. Raises
    ``GraphFramesError`` with a remediation hint when PIL is absent (this
    container does not ship it), keeping the Arrow-side plumbing
    importable and testable with the deterministic fakes."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:  # pragma: no cover - PIL not in container
        from graphframes_spark.util import GraphFramesError

        raise GraphFramesError(
            "PIL is not installed; `pip install pillow` on the cluster "
            "image, or use fake_decoder for plumbing tests"
        ) from exc

    def decode(payload: bytes) -> List[float]:
        img = Image.open(io.BytesIO(payload)).convert("L")
        hist = img.histogram()  # 256 bins
        # round(i*256/dim) boundaries distribute the remainder across
        # bins so every intensity level is counted even when dim ∤ 256
        bounds = [round(i * 256 / dim) for i in range(dim + 1)]
        counts = [
            float(sum(hist[bounds[i] : bounds[i + 1]])) for i in range(dim)
        ]
        total = sum(counts) or 1.0
        return [c / total for c in counts]

    return decode


def pil_resizer(fmt: str = "PNG") -> Callable[[bytes, int, int], bytes]:
    """Real image resizer adapter for :func:`resize_images`: PIL
    ``Image.resize`` re-encoded to ``fmt``, behind the same optional
    import contract as :func:`pil_image_decoder`."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:  # pragma: no cover - PIL not in container
        from graphframes_spark.util import GraphFramesError

        raise GraphFramesError(
            "PIL is not installed; `pip install pillow` on the cluster "
            "image, or use fake_resizer for plumbing tests"
        ) from exc

    def resize(payload: bytes, width: int, height: int) -> bytes:
        img = Image.open(io.BytesIO(payload))
        out = io.BytesIO()
        img.resize((width, height)).save(out, format=fmt)
        return out.getvalue()

    return resize


def wav_audio_decoder(dim: int = FEATURE_DIM) -> Callable[[bytes], List[float]]:
    """Real audio decoder (stdlib ``wave`` — no optional dependency):
    parse a RIFF/WAV payload and emit ``dim`` per-window RMS energy
    features, L-inf normalized. 16-bit PCM; undecodable payloads raise,
    letting a ``mapInPandas`` wrapper drop or quarantine them."""
    import struct as _struct
    import wave

    def decode(payload: bytes) -> List[float]:
        import io

        with wave.open(io.BytesIO(payload), "rb") as w:
            n = w.getnframes()
            raw = w.readframes(n)
            width = w.getsampwidth()
        if width != 2:
            raise ValueError(f"only 16-bit PCM supported, got width {width}")
        samples = _struct.unpack(f"<{len(raw) // 2}h", raw)
        if not samples:
            return [0.0] * dim
        step = max(1, len(samples) // dim)
        feats = []
        for i in range(dim):
            win = samples[i * step : (i + 1) * step]
            if win:
                feats.append((sum(s * s for s in win) / len(win)) ** 0.5)
            else:
                feats.append(0.0)
        peak = max(feats) or 1.0
        return [f / peak for f in feats]

    return decode


def soundfile_audio_decoder(
    dim: int = FEATURE_DIM,
) -> Callable[[bytes], List[float]]:
    """Real audio decoder adapter for non-WAV formats (FLAC/OGG/...):
    ``soundfile`` behind an optional import; same per-window RMS feature
    shape as :func:`wav_audio_decoder`."""
    try:
        import soundfile  # noqa: F401
    except ImportError as exc:  # pragma: no cover - not in container
        from graphframes_spark.util import GraphFramesError

        raise GraphFramesError(
            "soundfile is not installed; `pip install soundfile` on the "
            "cluster image, or use wav_audio_decoder for WAV payloads"
        ) from exc

    import io

    import numpy as np
    import soundfile as sf

    def decode(payload: bytes) -> List[float]:
        data, _sr = sf.read(io.BytesIO(payload), always_2d=True)
        mono = data.mean(axis=1)
        if mono.size == 0:
            return [0.0] * dim
        step = max(1, mono.size // dim)
        feats = [
            float(np.sqrt(np.mean(mono[i * step : (i + 1) * step] ** 2)))
            if mono[i * step : (i + 1) * step].size
            else 0.0
            for i in range(dim)
        ]
        peak = max(feats) or 1.0
        return [f / peak for f in feats]

    return decode


def fake_frame_extractor(payload: bytes, n_frames: int) -> List[bytes]:
    """Deterministic stand-in for a video frame sampler: n_frames evenly
    sized byte slices of the payload. Replace with an ffmpeg/pyav
    keyframe extractor in production — the pipeline shape (one binary in,
    n binaries out) does not change."""
    if not payload:
        return []
    step = max(1, len(payload) // n_frames)
    return [payload[i * step : (i + 1) * step] for i in range(n_frames)][:n_frames]


def explode_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "id",
    n_frames: int = 4,
    extractor: Callable[[bytes, int], List[bytes]] = fake_frame_extractor,
) -> DataFrame:
    """Frame sampling over a binary video column — Arrow-batched
    ``mapInPandas`` emitting one row per sampled frame:
    (id, frame_idx, frame: binary, frame_meta: struct).

    Row-multiplying transforms are exactly what ``mapInPandas`` exists
    for (a pandas UDF must stay 1:1): each input batch yields an output
    batch with ``n_frames`` rows per video. Only (id, payload) cross
    the Arrow boundary; frame metadata (byte length + sha256) is added
    JVM-side afterwards so the Python worker ships bytes, not hashes.
    At 100 TB the knobs are the same as extract_features — payloads in
    their own parquet column, ``maxPartitionBytes`` sized to decode
    cost, never collect payloads driver-side.
    """
    import pandas as pd

    if n_frames < 1:
        from graphframes_spark.util import GraphFramesError

        raise GraphFramesError(f"n_frames must be >= 1, got {n_frames}")

    schema = f"{id_col} long, frame_idx int, frame binary"
    pruned = df.select(F.col(id_col).cast("long").alias(id_col), F.col(payload_col))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                for i, frame in enumerate(extractor(bytes(p), n_frames)):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(frame)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    out = pruned.mapInPandas(run, schema=schema)
    return out.withColumn("frame_meta", binary_metadata(F.col("frame")))


def fake_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resizer: tile/truncate the
    payload to exactly width*height bytes (a fake raster). Replace with
    PIL's ``Image.resize`` in production — same bytes-in/bytes-out shape."""
    target = width * height
    if not payload:
        return bytes(target)
    reps = -(-target // len(payload))
    return (payload * reps)[:target]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "id",
    resizer: Callable[[bytes, int, int], bytes] = fake_resizer,
) -> DataFrame:
    """Image resize over a binary column — Arrow-batched ``mapInPandas``
    emitting (id, resized: binary, resized_meta: struct with the target
    dims). 1:1 rows, but kept on ``mapInPandas`` rather than a scalar
    pandas UDF so a real decoder can also *drop* undecodable rows by
    omitting them from the output batch. Only (id, payload) cross the
    Arrow boundary; metadata is stamped JVM-side."""
    import pandas as pd

    if width < 1 or height < 1:
        from graphframes_spark.util import GraphFramesError

        raise GraphFramesError(f"target dims must be >= 1, got {width}x{height}")

    schema = f"{id_col} long, resized binary"
    pruned = df.select(F.col(id_col).cast("long").alias(id_col), F.col(payload_col))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "resized": [
                        resizer(bytes(p), width, height) for p in pdf[payload_col]
                    ],
                }
            )

    out = pruned.mapInPandas(run, schema=schema)
    return out.withColumn(
        "resized_meta",
        F.struct(
            F.length("resized").alias("byte_len"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lower(F.sha2(F.col("resized"), 256)).alias("sha256"),
        ),
    )
