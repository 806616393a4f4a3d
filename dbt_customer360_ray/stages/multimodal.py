"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool map_batches stages.

The Ray-side plumbing (schemas, batch sizing, actor signatures, output layout)
is real and tested, and each media kind has a REAL no-new-dependency codec for
its standard uncompressed container: ``WavBackend`` (PCM WAV audio),
``BmpBackend`` (24-bit BMP images), ``Y4mBackend`` (YUV4MPEG2 video) — all
pure stdlib/numpy, each with an ``encode_*`` synthesis half and actor-pool
round-trip tests. Compressed formats (JPEG/MP3/H.264) still need an external
backend (PIL/ffmpeg/torchvision) dropped in behind the same ``DecodeBackend``
methods; ``FakeDecodeBackend`` stays the md5-chain fixture that makes the
distributed feature pipelines bit-exactly SQL-oracle-able.

Scale notes: binary payloads make rows wide — keep ``batch_size`` small
(default 32) and let block sizing follow ``DataContext.target_max_block_size``;
stateful decoder setup happens once per actor in ``__init__``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # nullable metadata
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class DecodeBackend:
    """Codec interface — THE extension seam for compressed formats. Built-in
    real backends cover each modality's standard uncompressed container
    (WavBackend/BmpBackend/Y4mBackend); JPEG/PNG/FLAC/MP3/MP4 need a
    user-supplied subclass wrapping Pillow/soundfile/ffmpeg (not installed in
    this build). See README 'Multimodal codec boundary' for the 3-line
    example subclass."""

    def decode_image(self, payload: bytes) -> np.ndarray:  # (H, W, 3) uint8
        raise NotImplementedError(
            "no compressed-image codec in this build — subclass DecodeBackend"
            ".decode_image with a Pillow/cv2 wrapper and pass it as the "
            "stage's backend (BmpBackend handles uncompressed 24-bit BMP)"
        )

    def decode_audio(self, payload: bytes) -> np.ndarray:  # (n_samples,) float32
        raise NotImplementedError(
            "no compressed-audio codec in this build — subclass DecodeBackend"
            ".decode_audio with a soundfile/ffmpeg wrapper and pass it as the "
            "stage's backend (WavBackend handles PCM WAV)"
        )

    def decode_video(self, payload: bytes) -> np.ndarray:  # (F, H, W, 3) uint8
        raise NotImplementedError(
            "no compressed-video codec in this build — subclass DecodeBackend"
            ".decode_video with an ffmpeg/PyAV wrapper and pass it as the "
            "stage's backend (Y4mBackend handles YUV4MPEG2)"
        )


def _md5_expand(payload: bytes, n_bytes: int) -> np.ndarray:
    """Deterministically expand a payload to ``n_bytes`` pseudo-random bytes by
    chaining md5 over ``HEX(payload) + '-' + i`` — chosen over numpy RNG so a
    SQL oracle (DuckDB ``md5(hex(payload) || '-' || i)``) can reproduce the
    decoded bytes exactly (see image_oracle_sql/audio_oracle_sql)."""
    hp = payload.hex().upper()
    out = b"".join(
        hashlib.md5(f"{hp}-{i}".encode()).digest() for i in range((n_bytes + 15) // 16)
    )
    return np.frombuffer(out[:n_bytes], dtype=np.uint8)


class FakeDecodeBackend(DecodeBackend):
    """Deterministic fake: bytes → md5-chain-expanded arrays (for tests and
    benchmarks; exactly reproducible in SQL, so the distributed feature
    pipeline can be oracle-checked end to end)."""

    def decode_image(self, payload: bytes) -> np.ndarray:
        return _md5_expand(payload, 16 * 16 * 3).reshape(16, 16, 3)

    def decode_audio(self, payload: bytes) -> np.ndarray:
        # samples are exact multiples of 2**-7 in [-1, 1) so that downstream
        # float sums stay exact (bit-identical to the SQL oracle)
        b = _md5_expand(payload, 1600)
        return ((b.astype(np.float32) - 128.0) / 128.0).astype(np.float32)

    VIDEO_FRAMES = 12
    VIDEO_HW = 8

    def decode_video(self, payload: bytes) -> np.ndarray:
        f, hw = self.VIDEO_FRAMES, self.VIDEO_HW
        return _md5_expand(payload, f * hw * hw * 3).reshape(f, hw, hw, 3)


class WavBackend(DecodeBackend):
    """REAL audio codec for PCM WAV containers — stdlib ``wave`` + numpy
    only, no new dependencies. Decodes 8-bit unsigned and 16/24/32-bit
    signed little-endian PCM; multi-channel audio is averaged to mono.
    Returns float32 samples in [-1, 1), the same contract as
    ``FakeDecodeBackend.decode_audio``, so ``AudioFeatures`` and the whole
    actor-pool pipeline run unchanged over real bytes (the fake stays the
    oracle fixture; this is the day-one real-bytes path the stub previously
    ended at)."""

    def decode_audio(self, payload: bytes) -> np.ndarray:
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            n, ch, sw = w.getnframes(), w.getnchannels(), w.getsampwidth()
            raw = w.readframes(n)
        if sw == 1:  # WAV 8-bit is unsigned
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif sw == 2:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif sw == 3:
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = (v ^ 0x800000) - 0x800000  # sign-extend 24-bit
            x = v.astype(np.float32) / 8388608.0
        elif sw == 4:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"unsupported PCM sample width: {sw} bytes")
        if ch > 1:
            x = x.reshape(-1, ch).mean(axis=1)
        return x.astype(np.float32)


class BmpBackend(DecodeBackend):
    """REAL image codec for uncompressed 24-bit BMP containers — pure
    numpy/struct, no new dependencies. Returns (H, W, 3) uint8 RGB, the same
    contract as ``FakeDecodeBackend.decode_image``, so ``ImageFeatures`` and
    the actor-pool pipeline run unchanged over real bytes. Handles the
    classic BITMAPINFOHEADER layout: bottom-up OR top-down (negative height)
    row order, 4-byte row padding, BGR channel order."""

    def decode_image(self, payload: bytes) -> np.ndarray:
        import struct

        if payload[:2] != b"BM":
            raise ValueError("not a BMP container (missing 'BM' magic)")
        data_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or compression != 0:
            raise ValueError(
                f"unsupported BMP: {bpp}-bit, compression={compression} "
                "(only uncompressed 24-bit is decoded)"
            )
        top_down = h < 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if not top_down:
            rows = rows[::-1]
        return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp24(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → real uncompressed 24-bit BMP bytes (bottom-up,
    padded rows): the synthesis half used by tests/fixtures to exercise
    ``BmpBackend`` against genuine containers."""
    import struct

    img = np.asarray(img, np.uint8)
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB → BGR, flip
    pixels = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels),
                       2835, 2835, 0, 0)
    return header + info + pixels


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """BT.601 limited-range YCbCr → RGB, integer arithmetic (the standard
    298/409/516 fixed-point recipe) with clipping — deterministic across
    platforms, no float rounding ambiguity."""
    c = y.astype(np.int32) - 16
    d = cb.astype(np.int32) - 128
    e = cr.astype(np.int32) - 128
    r = (298 * c + 409 * e + 128) >> 8
    g = (298 * c - 100 * d - 208 * e + 128) >> 8
    b = (298 * c + 516 * d + 128) >> 8
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


class Y4mBackend(DecodeBackend):
    """REAL video codec for YUV4MPEG2 (.y4m) containers — the standard
    uncompressed interchange format, pure numpy parsing. Returns
    (F, H, W, 3) uint8 RGB frames (same contract as
    ``FakeDecodeBackend.decode_video``, so ``VideoFeatures`` and its
    frame-sampling actor pool run unchanged over real bytes). Supports the
    C420 family (chroma nearest-neighbour upsampled) and C444; BT.601
    limited-range conversion via ``_ycbcr_to_rgb``."""

    def decode_video(self, payload: bytes) -> np.ndarray:
        nl = payload.index(b"\n")
        header = payload[:nl].decode("ascii", "replace").split(" ")
        if header[0] != "YUV4MPEG2":
            raise ValueError("not a YUV4MPEG2 container")
        w = h = None
        cs = "420"
        for tok in header[1:]:
            if tok.startswith("W"):
                w = int(tok[1:])
            elif tok.startswith("H"):
                h = int(tok[1:])
            elif tok.startswith("C"):
                cs = tok[1:]
        if not w or not h:
            raise ValueError("YUV4MPEG2 header missing W/H")
        if cs.startswith("420"):
            cw, ch = w // 2, h // 2
        elif cs.startswith("444"):
            cw, ch = w, h
        else:
            raise ValueError(f"unsupported Y4M colorspace C{cs}")
        ysz, csz = w * h, cw * ch
        frames = []
        pos = nl + 1
        while pos < len(payload):
            fnl = payload.index(b"\n", pos)  # FRAME parameter line
            if not payload[pos:fnl].startswith(b"FRAME"):
                raise ValueError("malformed Y4M frame marker")
            pos = fnl + 1
            buf = np.frombuffer(payload, np.uint8, ysz + 2 * csz, pos)
            pos += ysz + 2 * csz
            y = buf[:ysz].reshape(h, w)
            cb = buf[ysz : ysz + csz].reshape(ch, cw)
            cr = buf[ysz + csz :].reshape(ch, cw)
            if cw != w:  # 4:2:0 → nearest-neighbour upsample
                cb = cb.repeat(2, axis=0).repeat(2, axis=1)[:h, :w]
                cr = cr.repeat(2, axis=0).repeat(2, axis=1)[:h, :w]
            frames.append(_ycbcr_to_rgb(y, cb, cr))
        return np.stack(frames) if frames else np.zeros((0, h, w, 3), np.uint8)


def encode_y4m(frames: np.ndarray, colorspace: str = "444") -> bytes:
    """(F, H, W, 3) uint8 RGB → real YUV4MPEG2 bytes (BT.601 limited-range
    forward transform; C444 by default so decode∘encode is within ±2 of the
    source — the rounding of the fixed-point pair, no chroma loss). The
    synthesis half for tests/fixtures exercising ``Y4mBackend``."""
    frames = np.asarray(frames, np.uint8)
    f, h, w = frames.shape[:3]
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{colorspace}\n".encode()]
    for i in range(f):
        r = frames[i, :, :, 0].astype(np.int32)
        g = frames[i, :, :, 1].astype(np.int32)
        b = frames[i, :, :, 2].astype(np.int32)
        y = ((66 * r + 129 * g + 25 * b + 128) >> 8) + 16
        cb = ((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128
        cr = ((112 * r - 94 * g - 18 * b + 128) >> 8) + 128
        if colorspace.startswith("420"):
            cb = cb[::2, ::2]
            cr = cr[::2, ::2]
        out.append(b"FRAME\n")
        out.append(np.clip(y, 0, 255).astype(np.uint8).tobytes())
        out.append(np.clip(cb, 0, 255).astype(np.uint8).tobytes())
        out.append(np.clip(cr, 0, 255).astype(np.uint8).tobytes())
    return b"".join(out)


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float [-1, 1] mono samples → real PCM16 WAV bytes (stdlib ``wave``):
    the synthesis half used by tests/fixtures to exercise ``WavBackend``
    against genuine containers."""
    import io
    import wave

    pcm = np.clip(np.asarray(samples, np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).round().astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


class ImageFeatures:
    """Actor-pool stage: decode image payloads and emit pooled feature stats.

    Output columns: media_id, mean_r/g/b (float64), feature (list<float> 8-dim
    channel histogram) — the layout a real embedding stage would produce.
    """

    def __init__(self, backend: DecodeBackend | None = None):
        self.backend = backend or FakeDecodeBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, means, feats = [], [], []
        payloads = batch.column("payload").to_pylist()
        for mid, payload in zip(batch.column("media_id").to_pylist(), payloads):
            img = self.backend.decode_image(payload)
            ids.append(mid)
            means.append(img.reshape(-1, 3).mean(axis=0))
            hist, _ = np.histogram(img, bins=8, range=(0, 256))
            feats.append((hist / hist.sum()).astype(np.float32))
        means = np.array(means) if means else np.zeros((0, 3))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "mean_r": pa.array(means[:, 0] if len(ids) else [], pa.float64()),
                "mean_g": pa.array(means[:, 1] if len(ids) else [], pa.float64()),
                "mean_b": pa.array(means[:, 2] if len(ids) else [], pa.float64()),
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )


class AudioFeatures:
    """Actor-pool stage: decode audio and emit rms/zero-crossing features."""

    def __init__(self, backend: DecodeBackend | None = None):
        self.backend = backend or FakeDecodeBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, rms, zcr = [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            wav = self.backend.decode_audio(payload)
            ids.append(mid)
            # square/sum in float64: fake-decoded samples are multiples of
            # 2**-7, so the sum is exact and bit-identical to the SQL oracle
            rms.append(float(np.sqrt(np.square(wav, dtype=np.float64).mean())))
            zcr.append(float((np.diff(np.signbit(wav)) != 0).mean()))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "rms": pa.array(rms, pa.float64()),
                "zero_crossing_rate": pa.array(zcr, pa.float64()),
            }
        )


class VideoFeatures:
    """Actor-pool stage: decode video payloads, SAMPLE every ``stride``-th
    frame (the standard cost lever — decode once, featurize a subset), and
    emit per-video stats: sampled-frame count, per-channel means over sampled
    frames, and 'motion' = mean |Δbyte| between consecutive sampled frames.
    All sums are integer (exact in float64), so the fake-codec pipeline is
    bit-identical to ``video_oracle_sql``."""

    def __init__(self, backend: DecodeBackend | None = None, stride: int = 3):
        self.backend = backend or FakeDecodeBackend()
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_sampled, means, motion = [], [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            frames = self.backend.decode_video(payload)[:: self.stride]
            ids.append(mid)
            n_sampled.append(len(frames))
            means.append(frames.reshape(-1, 3).mean(axis=0))
            if len(frames) > 1:
                d = np.abs(np.diff(frames.astype(np.int64), axis=0))
                motion.append(float(d.mean()))
            else:
                motion.append(0.0)
        means = np.array(means) if means else np.zeros((0, 3))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "n_frames_sampled": pa.array(n_sampled, pa.int64()),
                "mean_r": pa.array(means[:, 0] if len(ids) else [], pa.float64()),
                "mean_g": pa.array(means[:, 1] if len(ids) else [], pa.float64()),
                "mean_b": pa.array(means[:, 2] if len(ids) else [], pa.float64()),
                "motion": pa.array(motion, pa.float64()),
            }
        )


def gen_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic synthetic media table (binary payloads + typed metadata)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio"], dtype=object)[rng.integers(0, 2, n)]
    payloads = [rng.integers(0, 256, 256, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(
                ["image/png" if k == "image" else "audio/wav" for k in kinds], pa.string()
            ),
            "width": pa.array([16 if k == "image" else None for k in kinds], pa.int32()),
            "height": pa.array([16 if k == "image" else None for k in kinds], pa.int32()),
            "duration_ms": pa.array(
                [None if k == "image" else 100 for k in kinds], pa.int32()
            ),
        },
        schema=MEDIA_SCHEMA,
    )


def _kind_filter(ds, kind: str):
    """Vectorized row filter on the ``kind`` column (Arrow compute inside the
    read task — no per-row Python lambda)."""
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t, _k=kind: t.filter(pc.equal(t.column("kind"), _k)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def image_features(ds, concurrency: int = 2, batch_size: int = 32, backend=None):
    """media Dataset → image feature Dataset (actor pool, small batches)."""
    return _kind_filter(ds, "image").map_batches(
        ImageFeatures,
        fn_constructor_kwargs={"backend": backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


def audio_features(ds, concurrency: int = 2, batch_size: int = 32, backend=None):
    return _kind_filter(ds, "audio").map_batches(
        AudioFeatures,
        fn_constructor_kwargs={"backend": backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


def video_features(ds, concurrency: int = 2, batch_size: int = 32, backend=None, stride: int = 3):
    """media Dataset → per-video frame-sampled feature Dataset (actor pool)."""
    return _kind_filter(ds, "video").map_batches(
        VideoFeatures,
        fn_constructor_kwargs={"backend": backend, "stride": stride},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


def gen_video_table(n: int = 64, seed: int = 7) -> pa.Table:
    """Deterministic synthetic video table (separate from gen_media_table so
    the cached image/audio fixture parquet stays byte-stable)."""
    rng = np.random.default_rng(seed)
    hw = FakeDecodeBackend.VIDEO_HW
    frames = FakeDecodeBackend.VIDEO_FRAMES
    payloads = [rng.integers(0, 256, 256, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(["video"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["video/mp4"] * n, pa.string()),
            "width": pa.array([hw] * n, pa.int32()),
            "height": pa.array([hw] * n, pa.int32()),
            "duration_ms": pa.array([frames * 40] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def media_fixture_path(n: int = 128, seed: int = 5) -> str:
    """Write (once) the synthetic media table to parquet so the engine and the
    DuckDB oracle read the SAME payload bytes; returns the path."""
    import os

    import pyarrow.parquet as pq

    from ..pipelines.cdc_replay import FIXTURE_ROOT

    out_dir = os.path.join(FIXTURE_ROOT, "media")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"media-{n}-s{seed}.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        pq.write_table(gen_media_table(n, seed=seed), tmp)
        os.replace(tmp, path)
    return path


def video_fixture_path(n: int = 64, seed: int = 7) -> str:
    import os

    import pyarrow.parquet as pq

    from ..pipelines.cdc_replay import FIXTURE_ROOT

    out_dir = os.path.join(FIXTURE_ROOT, "media")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"video-{n}-s{seed}.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        pq.write_table(gen_video_table(n, seed=seed), tmp)
        os.replace(tmp, path)
    return path


def _expand_sql(path: str, kind: str, n_bytes: int) -> str:
    """Rows (media_id, pos, byte) re-deriving _md5_expand in DuckDB."""
    n_digests = (n_bytes + 15) // 16
    return f"""
        WITH m AS (
            SELECT media_id, hex(payload) AS hp
            FROM read_parquet('{path}') WHERE kind = '{kind}'
        ),
        d AS (
            SELECT media_id, i, md5(hp || '-' || CAST(i AS VARCHAR)) AS h
            FROM m, range({n_digests}) t(i)
        ),
        b AS (
            SELECT media_id, i * 16 + j AS pos,
                   ('0x' || substr(h, CAST(j AS INT) * 2 + 1, 2))::INT AS byte
            FROM d, range(16) u(j)
            WHERE i * 16 + j < {n_bytes}
        )
    """


def image_oracle_sql(path: str) -> str:
    """Per-channel pixel means of the md5-chain-decoded 16x16x3 image —
    bit-identical to ImageFeatures over FakeDecodeBackend (integer sums,
    power-of-two division)."""
    return _expand_sql(path, "image", 16 * 16 * 3) + """
        SELECT media_id,
               avg(CASE WHEN pos % 3 = 0 THEN byte END) AS mean_r,
               avg(CASE WHEN pos % 3 = 1 THEN byte END) AS mean_g,
               avg(CASE WHEN pos % 3 = 2 THEN byte END) AS mean_b
        FROM b GROUP BY media_id
    """


def video_oracle_sql(path: str, stride: int = 3) -> str:
    """Frame-sampled video features of the md5-chain-decoded (F, 8, 8, 3)
    array — bit-identical to VideoFeatures (integer sums; identical float64
    divisions). Frame index = pos // bytes_per_frame; sampled frames are
    frame % stride == 0; motion pairs byte pos with the same offset
    stride·frame_bytes later."""
    f = FakeDecodeBackend.VIDEO_FRAMES
    hw = FakeDecodeBackend.VIDEO_HW
    fb = hw * hw * 3  # bytes per frame
    n_bytes = f * fb
    last_sampled = ((f - 1) // stride) * stride
    return _expand_sql(path, "video", n_bytes) + f"""
        , sampled AS (
            SELECT media_id, pos, byte, (pos // {fb}) AS frame
            FROM b WHERE (pos // {fb}) % {stride} = 0
        ), chan AS (
            SELECT media_id,
                   CAST(count(DISTINCT frame) AS BIGINT) AS n_frames_sampled,
                   avg(CASE WHEN pos % 3 = 0 THEN byte END) AS mean_r,
                   avg(CASE WHEN pos % 3 = 1 THEN byte END) AS mean_g,
                   avg(CASE WHEN pos % 3 = 2 THEN byte END) AS mean_b
            FROM sampled GROUP BY media_id
        ), mot AS (
            SELECT x.media_id, avg(abs(x.byte - y.byte)) AS motion
            FROM sampled x
            JOIN sampled y
              ON y.media_id = x.media_id AND y.pos = x.pos + {stride * fb}
            WHERE x.frame < {last_sampled}
            GROUP BY x.media_id
        )
        SELECT c.media_id, c.n_frames_sampled, c.mean_r, c.mean_g, c.mean_b,
               coalesce(m.motion, 0.0) AS motion
        FROM chan c LEFT JOIN mot m ON m.media_id = c.media_id
    """


def audio_oracle_sql(path: str) -> str:
    """rms/zero-crossing of the md5-chain-decoded waveform — bit-identical to
    AudioFeatures (samples are multiples of 2**-7, sums stay exact)."""
    return _expand_sql(path, "audio", 1600) + """
        , s AS (
            SELECT media_id, pos, ((byte - 128) / 128.0) AS sample,
                   (byte >= 128) AS nonneg,
                   lag(byte >= 128) OVER (PARTITION BY media_id ORDER BY pos)
                       AS prev_nonneg
            FROM b
        )
        SELECT media_id,
               sqrt(avg(sample * sample)) AS rms,
               sum(CASE WHEN prev_nonneg IS NOT NULL AND nonneg != prev_nonneg
                        THEN 1 ELSE 0 END)::DOUBLE / 1599 AS zero_crossing_rate
        FROM s GROUP BY media_id
    """
