"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, decoded/feature-extracted in an actor-pool
``map_batches`` stage.

The decode kernel itself is a STUB (no image/audio libraries in this
container): ``FakeDecoder`` derives deterministic pseudo-features from the
bytes (length, crc-derived "dimensions", an 8-byte content digest). The
Ray-side plumbing — small batches for wide binary rows, actor pool with
per-actor setup, typed Arrow output schema — is the real, tested part;
swapping in PIL/ffmpeg is a one-class change (see ``RealDecoder``).
"""

from __future__ import annotations

import hashlib
import zlib

import pyarrow as pa


class FakeDecoder:
    """Deterministic stand-in for an image decoder (actor state = the
    'model'/decoder tables, built once per actor)."""

    def __init__(self) -> None:
        self._salt = b"media-v1"  # stands in for decoder init cost

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n_bytes, widths, heights, digests = [], [], [], []
        for b in payloads:
            b = b or b""
            crc = zlib.crc32(self._salt + b)
            n_bytes.append(len(b))
            widths.append(crc % 1920 + 1)
            heights.append((crc >> 11) % 1080 + 1)
            digests.append(hashlib.blake2b(b, digest_size=8).hexdigest())
        return pa.table(
            {
                "url": batch["url"],
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "fake_width": pa.array(widths, pa.int64()),
                "fake_height": pa.array(heights, pa.int64()),
                "digest": pa.array(digests, pa.string()),
            }
        )


class RealDecoder:
    """The production shape: identical signature, real libraries.
    Raises immediately — the container has no imaging stack."""

    def __init__(self) -> None:
        raise NotImplementedError(
            "image/audio decode libraries are not available in this "
            "environment; use FakeDecoder (same schema) for plumbing tests"
        )


def media_features_stage(ds, *, batch_size: int = 128, concurrency=(1, 4)):
    """(url, payload: binary) → (url, n_bytes, fake_width, fake_height,
    digest). Small batch_size: payloads are wide binary rows — batch ×
    concurrency must fit worker heap (SURVEY.md §4.2 memory row)."""
    return ds.map_batches(
        FakeDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
