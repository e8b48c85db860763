"""Multimodal column plumbing: images/audio/video as opaque binary columns.

The Spark-side machinery (schemas, Arrow batching through mapInPandas,
partition sizing) is format-agnostic. Decoding is dispatched per modality
through ``DECODERS``:

- **image**: real pure-Python decoder for binary PPM (P6) — header parse,
  pixel decode, block-average downsample, 8-dim color/luminance feature.
- **audio**: real pure-Python decoder for RIFF/WAVE PCM16 — chunk walk,
  sample decode, 8-dim RMS/zero-crossing/band-energy feature.
- **video**: real pure-Python decoder for YUV4MPEG2 (Y4M, C444) — header
  parse, FRAME walk, uniform frame sampling, 8-dim luminance/motion
  feature.

Compressed formats (JPEG/PNG/MP3/H.264) need external codecs — in
production swap the decoder per modality without touching the pipeline.
"""
import hashlib
import struct

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, StringType, StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField('media_id', StringType(), False),
    StructField('modality', StringType(), False),   # image | audio | video
    StructField('mime_type', StringType(), True),
    StructField('payload', BinaryType(), True),
    StructField('width', IntegerType(), True),
    StructField('height', IntegerType(), True),
    StructField('duration_ms', IntegerType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField('media_id', StringType(), False),
    StructField('modality', StringType(), False),
    StructField('n_bytes', IntegerType(), False),
    StructField('payload_sha256', StringType(), False),
    StructField('feature', ArrayType(FloatType()), True),
])


# ------------------------------ PPM (image) ------------------------------ #

def encode_ppm(width, height, pixels):
    """Binary PPM (P6) encoder. ``pixels`` is a flat list of (r, g, b)
    byte triples, row-major."""
    header = 'P6\n{} {}\n255\n'.format(width, height).encode('ascii')
    body = bytes(c for px in pixels for c in px)
    return header + body


def _decode_ppm_array(payload: bytes):
    """Binary PPM (P6) decoder → (width, height, uint8 ndarray of shape
    (height*width, 3)) — one ``np.frombuffer`` over the body, no per-pixel
    Python."""
    import numpy as np

    if not payload.startswith(b'P6'):
        raise ValueError('not a binary PPM (P6) payload')
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens, i, n = [], 2, len(payload)
    while len(tokens) < 3 and i < n:
        c = payload[i:i + 1]
        if c == b'#':
            while i < n and payload[i:i + 1] != b'\n':
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j:j + 1].isspace():
                j += 1
            tokens.append(int(payload[i:j]))
            i = j
    i += 1  # single whitespace after maxval
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError('only 8-bit PPM supported')
    body = payload[i:i + 3 * width * height]
    if len(body) != 3 * width * height:
        raise ValueError('truncated PPM body')
    return width, height, np.frombuffer(body, np.uint8).reshape(-1, 3)


def decode_ppm(payload: bytes):
    """Binary PPM (P6) decoder → (width, height, [(r, g, b), ...])."""
    width, height, arr = _decode_ppm_array(payload)
    return width, height, [tuple(px) for px in arr.tolist()]


def resize_image_block_mean(width, height, pixels, out_w=8, out_h=8):
    """Nearest-block-average downsample — the resize step of the pipeline.
    Per OUTPUT cell one numpy block mean (out_w × out_h slices, never a
    per-pixel Python loop)."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.int64).reshape(height, width, 3)
    out = []
    for oy in range(out_h):
        y0 = height * oy // out_h
        y1 = max(height * (oy + 1) // out_h, y0 + 1)
        for ox in range(out_w):
            x0 = width * ox // out_w
            x1 = max(width * (ox + 1) // out_w, x0 + 1)
            block = arr[y0:min(y1, height), x0:min(x1, width)]
            cnt = block.shape[0] * block.shape[1]
            sums = block.sum(axis=(0, 1))
            out.append(tuple(float(s) / cnt for s in sums))
    return out


def _decode_image(payload: bytes):
    """PPM decode → 8-dim feature: mean R/G/B, luminance std, 4-bin
    luminance histogram (all in [0, 1]). Pure numpy arithmetic on the
    decoded byte array (integer sums are exact in float64, so values match
    the scalar formulation)."""
    import numpy as np

    _w, _h, arr = _decode_ppm_array(payload)
    n = arr.shape[0]
    rgb = arr.astype(np.float64)
    mean_r, mean_g, mean_b = (rgb.sum(axis=0) / n / 255.0).tolist()
    lum = (rgb @ np.array([0.299, 0.587, 0.114])) / 255.0
    mean_l = lum.sum() / n
    std_l = float(np.sqrt(((lum - mean_l) ** 2).sum() / n))
    bins = np.minimum((lum * 4).astype(np.int64), 3)
    hist = np.bincount(bins, minlength=4)
    return [mean_r, mean_g, mean_b, std_l] + (hist / n).tolist()


# ------------------------------ WAV (audio) ------------------------------ #

def encode_wav(samples, sample_rate=8000):
    """RIFF/WAVE PCM16 mono encoder. ``samples`` are ints in [-32768, 32767]."""
    body = struct.pack('<{}h'.format(len(samples)), *samples)
    fmt = struct.pack('<HHIIHH', 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = (b'WAVE'
              + b'fmt ' + struct.pack('<I', len(fmt)) + fmt
              + b'data' + struct.pack('<I', len(body)) + body)
    return b'RIFF' + struct.pack('<I', len(chunks)) + chunks


def _decode_wav_array(payload: bytes):
    """RIFF/WAVE PCM16 decoder → (sample_rate, int32 ndarray of mono
    samples). Walks the chunk list; stereo is averaged to mono (floor
    division, matching integer ``//``). All chunk sizes are validated
    BEFORE unpacking — a truncated or hostile payload raises ValueError,
    never struct.error (so per-row handlers can catch decode failures
    uniformly)."""
    import numpy as np

    if len(payload) < 12 or payload[:4] != b'RIFF' \
            or payload[8:12] != b'WAVE':
        raise ValueError('not a RIFF/WAVE payload')
    i, n = 12, len(payload)
    sample_rate = None
    channels = None
    samples = None
    while i + 8 <= n:
        chunk_id = payload[i:i + 4]
        (size,) = struct.unpack('<I', payload[i + 4:i + 8])
        if i + 8 + size > n:
            raise ValueError('truncated WAV chunk {!r}'.format(chunk_id))
        data = payload[i + 8:i + 8 + size]
        if chunk_id == b'fmt ':
            if len(data) < 16:
                raise ValueError('fmt chunk too short')
            audio_format, channels, sample_rate = \
                struct.unpack('<HHI', data[:8])
            bits = struct.unpack('<H', data[14:16])[0]
            if audio_format != 1 or bits != 16:
                raise ValueError('only PCM16 WAV supported')
            if channels < 1:
                raise ValueError('invalid channel count')
        elif chunk_id == b'data':
            raw = np.frombuffer(data[:(len(data) // 2) * 2], '<i2') \
                .astype(np.int32)
            if channels and channels > 1:
                n_frames = len(raw) // channels
                raw = raw[:n_frames * channels] \
                    .reshape(n_frames, channels).sum(axis=1) // channels
            samples = raw
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError('missing fmt/data chunk')
    if sample_rate <= 0:
        raise ValueError('invalid sample rate')
    return sample_rate, samples


def decode_wav(payload: bytes):
    """RIFF/WAVE PCM16 decoder → (sample_rate, [mono samples])."""
    sample_rate, samples = _decode_wav_array(payload)
    return sample_rate, samples.tolist()


def _decode_audio(payload: bytes):
    """WAV decode → 8-dim feature: duration (s), RMS, peak, zero-crossing
    rate, 4-band windowed RMS — numpy reductions over the sample array."""
    import numpy as np

    sample_rate, samples = _decode_wav_array(payload)
    n = len(samples)
    if n == 0:
        return [0.0] * 8
    norm = samples.astype(np.float64) / 32768.0
    rms = float(np.sqrt((norm * norm).sum() / n))
    peak = float(np.abs(norm).max())
    zcr = int(np.count_nonzero((norm[:-1] < 0) != (norm[1:] < 0))) \
        / max(n - 1, 1)
    bands = []
    for b in range(4):
        seg = norm[n * b // 4:n * (b + 1) // 4]
        if len(seg) == 0:
            bands.append(0.0)
        else:
            bands.append(float(np.sqrt((seg * seg).sum() / len(seg))))
    return [n / sample_rate, rms, peak, zcr] + bands


# ------------------------------ Y4M (video) ------------------------------ #

def encode_y4m(width, height, frames, fps=25):
    """YUV4MPEG2 encoder (C420jpeg-less: 4:4:4 planar). ``frames`` is a
    list of per-frame flat Y/U/V byte triples-planes: (y_bytes, u_bytes,
    v_bytes), each of length width*height."""
    header = 'YUV4MPEG2 W{} H{} F{}:1 Ip A1:1 C444\n'.format(
        width, height, fps).encode('ascii')
    body = b''.join(
        b'FRAME\n' + y + u + v for y, u, v in frames)
    return header + body


def decode_y4m(payload: bytes):
    """YUV4MPEG2 (C444) decoder → (width, height, fps, [y_plane bytes per
    frame]). Pure stream walk: header line, then FRAME-delimited raw
    planes."""
    nl = payload.index(b'\n')
    header = payload[:nl].decode('ascii', errors='replace').split()
    if not header or header[0] != 'YUV4MPEG2':
        raise ValueError('not a YUV4MPEG2 payload')
    width = height = fps = None
    colorspace = 'C420'
    for token in header[1:]:
        if token.startswith('W'):
            width = int(token[1:])
        elif token.startswith('H'):
            height = int(token[1:])
        elif token.startswith('F'):
            fps = int(token[1:].split(':')[0])
        elif token.startswith('C'):
            colorspace = token
    if width is None or height is None:
        raise ValueError('missing W/H in Y4M header')
    if not colorspace.startswith('C444'):
        raise ValueError('only C444 Y4M supported (got {})'.format(colorspace))
    plane = width * height
    frame_size = 3 * plane
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b'\n', pos)
        if not payload[pos:fnl].startswith(b'FRAME'):
            raise ValueError('missing FRAME marker')
        start = fnl + 1
        if start + frame_size > len(payload):
            raise ValueError('truncated Y4M frame')
        frames.append(payload[start:start + plane])  # luma plane only
        pos = start + frame_size
    return width, height, fps or 25, frames


def sample_frames(frames, n_samples=4):
    """Uniform frame sampling — the decode/frame-sample step of a video
    feature pipeline."""
    if not frames:
        return []
    n = len(frames)
    idx = sorted({min(n - 1, (n * i) // n_samples) for i in range(n_samples)})
    return [frames[i] for i in idx]


def _decode_video(payload: bytes):
    """Y4M decode → 8-dim feature: n_frames, duration (s), then mean
    luminance of up to 4 uniformly sampled frames, then inter-frame motion
    proxy (mean |Δluma| between first and last sample), padded with 0.
    Per-frame numpy reductions — never a per-pixel Python loop."""
    import numpy as np

    width, height, fps, lumas = decode_y4m(payload)
    n = len(lumas)
    sampled = sample_frames(lumas, 4)
    planes = [np.frombuffer(p, np.uint8) for p in sampled]
    means = [float(p.astype(np.int64).sum()) / len(p) / 255.0
             for p in planes]
    means += [0.0] * (4 - len(means))
    if len(planes) >= 2:
        first, last = planes[0].astype(np.int64), planes[-1].astype(np.int64)
        motion = float(np.abs(first - last).sum()) / len(first) / 255.0
    else:
        motion = 0.0
    return [float(n), n / fps, motion] + means + [0.0]


#: modality → decoder; ALL THREE are real pure-Python paths for codec-free
#: formats (PPM, WAV-PCM16, Y4M); compressed formats (JPEG/MP3/H.264) need
#: external codecs — swap per modality in production
DECODERS = {
    'image': _decode_image,
    'audio': _decode_audio,
    'video': _decode_video,
}


# -------------------- compressed formats (injectable) -------------------- #

def sniff_format(payload: bytes) -> str:
    """Container sniffing from magic bytes — the dispatch key for the
    per-FORMAT decoder registry (a crawl's media column mixes formats
    within one modality; routing must come from the bytes, not the
    often-lying mime column)."""
    if payload.startswith(b'P6'):
        return 'ppm'
    if payload[:4] == b'RIFF' and payload[8:12] == b'WAVE':
        return 'wav'
    if payload.startswith(b'YUV4MPEG2'):
        return 'y4m'
    if payload.startswith(b'\xff\xd8\xff'):
        return 'jpeg'
    if payload.startswith(b'\x89PNG\r\n\x1a\n'):
        return 'png'
    if payload.startswith(b'ID3') or payload[:2] in (b'\xff\xfb',
                                                     b'\xff\xf3',
                                                     b'\xff\xf2'):
        return 'mp3'
    if payload[4:8] == b'ftyp':
        return 'mp4'
    return 'unknown'


#: format → decoder returning the modality's 8-dim feature list. The
#: codec-free formats ship real pure-Python decoders; compressed formats
#: (jpeg/png/mp3/mp4) have NO in-environment codec — inject one with
#: :func:`register_format_decoder` (production: Pillow/ffmpeg wrappers).
#: An unregistered compressed payload decodes to feature = NULL, never a
#: task failure.
FORMAT_DECODERS = {
    'ppm': _decode_image,
    'wav': _decode_audio,
    'y4m': _decode_video,
}


def register_format_decoder(fmt: str, decoder) -> None:
    """Inject an external decoder (``payload bytes -> feature list``) for
    a sniffed format, e.g. a Pillow-backed jpeg/png decoder. The Spark
    plumbing (Arrow batching, null-on-corrupt, schema) is unchanged —
    this is the production swap-in point for compressed codecs."""
    FORMAT_DECODERS[fmt] = decoder


def try_register_pillow_decoders() -> bool:
    """Best-effort registration of Pillow-backed jpeg/png decoders (the
    external-codec path); returns False untouched when Pillow is absent
    (this container). The decoded RGB array feeds the SAME 8-dim image
    feature as the PPM path."""
    try:
        import io

        import numpy as np
        from PIL import Image
    except ImportError:
        return False

    def _decode_compressed_image(payload: bytes):
        img = Image.open(io.BytesIO(payload)).convert('RGB')
        arr = np.asarray(img, dtype=np.uint8).reshape(-1, 3)
        n = arr.shape[0]
        rgb = arr.astype(np.float64)
        mean_r, mean_g, mean_b = (rgb.sum(axis=0) / n / 255.0).tolist()
        lum = (rgb @ np.array([0.299, 0.587, 0.114])) / 255.0
        mean_l = lum.sum() / n
        std_l = float(np.sqrt(((lum - mean_l) ** 2).sum() / n))
        bins = np.minimum((lum * 4).astype(np.int64), 3)
        hist = np.bincount(bins, minlength=4)
        return [mean_r, mean_g, mean_b, std_l] + (hist / n).tolist()

    register_format_decoder('jpeg', _decode_compressed_image)
    register_format_decoder('png', _decode_compressed_image)
    return True


def decode_payload(modality: str, payload: bytes, format_decoders=None):
    """Format-sniffed decode: a registered per-format decoder wins;
    an unsniffable payload falls back to the modality decoder (legacy
    headerless callers); a sniffed-but-unregistered compressed format
    raises (the extract stage maps that to feature = NULL).

    ``format_decoders`` is the registry snapshot to dispatch against —
    the Spark stage captures it in its closure at plan time, because
    executor Python workers re-import this module and would NOT see
    driver-side mutations of the module-global dict."""
    if format_decoders is None:
        format_decoders = FORMAT_DECODERS
    fmt = sniff_format(payload)
    decoder = format_decoders.get(fmt)
    if decoder is not None:
        return decoder(payload)
    if fmt == 'unknown':
        return DECODERS[modality](payload)
    raise NotImplementedError(
        'no decoder registered for sniffed format {!r} — inject one via '
        'register_format_decoder'.format(fmt))


def deterministic_fake_feature(payload: bytes, dim=8):
    """Deterministic stand-in feature (payload sha256 → dim floats) for
    modalities/formats without an in-environment decoder."""
    digest = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(digest[4 * i:4 * i + 4], 'little') / float(2 ** 32)
        for i in range(dim)
    ]


def extract_features(media: DataFrame, use_fake_decoder=False,
                     feature_dim=8, format_decoders=None) -> DataFrame:
    """Arrow-batched feature extraction over a media table.

    One mapInPandas stage; per-batch the decoder runs on raw bytes,
    format-sniffed from magic bytes and dispatched through the decoder
    registry (``format_decoders`` overrides it per call; by default the
    module registry is SNAPSHOTTED here on the driver so injected
    decoders reach the executors through the closure). With
    ``use_fake_decoder=True`` every modality uses the sha256-derived fake
    (useful when payloads are in formats without in-environment codecs).

    Hostile-web-input policy (same as text extraction): a corrupt or
    truncated payload must NOT fail the Spark task (and its retries) — the
    per-row decode is wrapped, and failures emit ``feature = NULL`` so
    downstream filters can drop or count them."""
    import pandas as pd

    if format_decoders is None:
        format_decoders = dict(FORMAT_DECODERS)

    def extract(batches):
        for pdf in batches:
            rows = []
            for media_id, modality, payload in zip(
                    pdf['media_id'], pdf['modality'], pdf['payload']):
                payload = bytes(payload) if payload is not None else b''
                try:
                    if use_fake_decoder:
                        feature = deterministic_fake_feature(
                            payload, feature_dim)
                    else:
                        feature = decode_payload(modality, payload,
                                                 format_decoders)
                except Exception:
                    feature = None  # corrupt payload: null sentinel, not a
                    #                 task failure
                rows.append({
                    'media_id': media_id,
                    'modality': modality,
                    'n_bytes': len(payload),
                    'payload_sha256': hashlib.sha256(payload).hexdigest(),
                    'feature': feature,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def synthetic_media(spark, n_rows=100, partitions=4,
                    decodable=True) -> DataFrame:
    """Deterministic synthetic media table: image rows carry real PPM
    payloads, audio rows real WAV payloads, video rows real Y4M payloads
    (all decodable end-to-end); with ``decodable=False`` every row carries
    seeded raw bytes (the fake-decoder plumbing path)."""
    import pandas as pd

    def build(batches):
        modalities = ['image', 'audio', 'video']
        for pdf in batches:
            rows = []
            for i in pdf['id']:
                i = int(i)
                modality = modalities[i % 3]
                width = height = duration = None
                if not decodable:
                    payload = hashlib.sha256(str(i).encode()).digest() * (1 + i % 5)
                    mime = None
                elif modality == 'video':
                    width = height = 8
                    frames = []
                    for f in range(2 + i % 3):
                        y = bytes(((x + f * 11 + i) % 256)
                                  for x in range(width * height))
                        u = v = bytes(width * height)
                        frames.append((y, u, v))
                    payload = encode_y4m(width, height, frames)
                    duration = 1000 * len(frames) // 25
                    mime = 'video/x-yuv4mpeg'
                elif modality == 'image':
                    width = height = 8 + (i % 3) * 4
                    pixels = [((x * 37 + i) % 256, (y * 11 + i) % 256,
                               (x * y + i) % 256)
                              for y in range(height) for x in range(width)]
                    payload = encode_ppm(width, height, pixels)
                    mime = 'image/x-portable-pixmap'
                else:
                    n_samples = 800 + (i % 5) * 80
                    samples = [int(20000 * ((k * (i + 3)) % 97 / 97.0 - 0.5))
                               for k in range(n_samples)]
                    payload = encode_wav(samples)
                    duration = 1000 * n_samples // 8000
                    mime = 'audio/wav'
                rows.append({
                    'media_id': 'media-{}'.format(i),
                    'modality': modality,
                    'mime_type': mime,
                    'payload': payload,
                    'width': width,
                    'height': height,
                    'duration_ms': duration,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return spark.range(0, n_rows, numPartitions=partitions) \
        .mapInPandas(build, schema=MEDIA_SCHEMA)
