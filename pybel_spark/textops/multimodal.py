"""Multimodal column plumbing: images/audio/video as opaque binary columns.

The Spark-side machinery (schemas, Arrow batching through mapInPandas,
partition sizing) is real and tested; the actual media decoding is stubbed
behind ``DECODERS`` because no image/audio libraries exist in this
environment — drop in a real decoder (PIL/librosa/av) per modality without
touching the pipeline.
"""
import hashlib

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


def _decode_image(payload: bytes):
    """Real implementation would decode + resize + embed; no image libs here."""
    raise NotImplementedError('image decoding requires PIL/opencv — not in env')


def _decode_audio(payload: bytes):
    raise NotImplementedError('audio decoding requires librosa/soundfile — not in env')


def _decode_video(payload: bytes):
    raise NotImplementedError('video frame sampling requires av/ffmpeg — not in env')


#: modality → decoder; swap the stubs for real ones in production
DECODERS = {
    'image': _decode_image,
    'audio': _decode_audio,
    'video': _decode_video,
}


def deterministic_fake_feature(payload: bytes, dim=8):
    """Deterministic stand-in feature so the distributed plumbing is testable:
    dim floats derived from the payload sha256."""
    digest = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(digest[4 * i:4 * i + 4], 'little') / float(2 ** 32)
        for i in range(dim)
    ]


def extract_features(media: DataFrame, use_fake_decoder=True,
                     feature_dim=8) -> DataFrame:
    """Arrow-batched feature extraction over a media table.

    One mapInPandas stage; per-batch the decoder runs on raw bytes. With
    use_fake_decoder=False it dispatches to DECODERS (NotImplementedError in
    this environment — by design)."""
    import pandas as pd

    def extract(batches):
        for pdf in batches:
            rows = []
            for media_id, modality, payload in zip(
                    pdf['media_id'], pdf['modality'], pdf['payload']):
                payload = bytes(payload) if payload is not None else b''
                if use_fake_decoder:
                    feature = deterministic_fake_feature(payload, feature_dim)
                else:
                    feature = DECODERS[modality](payload)
                rows.append({
                    'media_id': media_id,
                    'modality': modality,
                    'n_bytes': len(payload),
                    'payload_sha256': hashlib.sha256(payload).hexdigest(),
                    'feature': feature,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def synthetic_media(spark, n_rows=100, partitions=4) -> DataFrame:
    """Deterministic synthetic media table for tests (payload = seeded bytes)."""
    import pandas as pd

    def build(batches):
        modalities = ['image', 'audio', 'video']
        for pdf in batches:
            rows = []
            for i in pdf['id']:
                i = int(i)
                payload = hashlib.sha256(str(i).encode()).digest() * (1 + i % 5)
                rows.append({
                    'media_id': 'media-{}'.format(i),
                    'modality': modalities[i % 3],
                    'mime_type': None,
                    'payload': payload,
                    'width': 64 if i % 3 == 0 else None,
                    'height': 64 if i % 3 == 0 else None,
                    'duration_ms': 1000 * (i % 30) if i % 3 else None,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return spark.range(0, n_rows, numPartitions=partitions) \
        .mapInPandas(build, schema=MEDIA_SCHEMA)
