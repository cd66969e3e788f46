"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, decoded/feature-extracted in an actor-pool
``map_batches`` stage.

Two decoders share the stage signature:

- ``RealDecoder`` — a real, dependency-free image decoder built on
  ``struct`` + ``zlib`` + numpy: PNG (8-bit grayscale/RGB/RGBA,
  non-interlaced, all five scanline filters) and BMP (24-bit
  uncompressed BITMAPINFOHEADER). It parses actual pixel data and emits
  dimensions + luminance statistics. Formats beyond that (JPEG, 16-bit,
  interlaced PNG, ...) surface as ``format='unsupported'`` rows rather
  than exceptions — at corpus scale a decode stage must degrade
  per-row, never per-task.
- ``FakeDecoder`` — the deterministic stand-in kept for plumbing tests
  (schema/batching/actor lifecycle) where pixel content is irrelevant.

``encode_png`` / ``encode_bmp`` are the matching fixture writers
(deterministic, stdlib-only) so tests and the ``pages_media_features``
query can synthesize real binary payloads without an imaging stack.

The Ray-side shape is the load-bearing part at 100 TB: small batches
(wide binary rows — batch × concurrency must fit worker heap), actor
pool with per-actor setup in ``__init__``, typed Arrow output.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# --------------------------------------------------------------------------
# Fixture encoders (deterministic, stdlib-only)
# --------------------------------------------------------------------------


def encode_png(arr: np.ndarray, *, filter_type: int = 0) -> bytes:
    """Minimal PNG writer for a (h, w) grayscale, (h, w, 3) RGB or
    (h, w, 4) RGBA uint8 array. ``filter_type`` applies one scanline
    filter (0..4) to EVERY row — handy for exercising each decode path
    with known pixels."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, ch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color, ch = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color, ch = 6, 4
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = a.shape[:2]
    bpp = ch
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        line = a[y].reshape(-1)
        f = _filter_forward(filter_type, line, prev, bpp)
        raw.append(filter_type)
        raw.extend(f.tobytes())
        prev = line

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def encode_bmp(arr: np.ndarray) -> bytes:
    """Minimal 24-bit uncompressed BMP writer for a (h, w, 3) RGB uint8
    array (stored bottom-up, BGR, rows padded to 4 bytes — the classic
    BITMAPINFOHEADER layout)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"encode_bmp wants (h, w, 3), got {arr.shape}")
    h, w = a.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = a[y, :, ::-1].tobytes()  # RGB → BGR
        body.extend(row)
        body.extend(b"\x00" * (stride - len(row)))
    pix_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", pix_off + len(body), 0, 0, pix_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + bytes(body)


def _filter_forward(ft: int, line: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Apply PNG scanline filter ``ft`` for writing (inverse of decode)."""
    cur = line.astype(np.int32)
    left = np.zeros_like(cur)
    left[bpp:] = cur[:-bpp]
    up = prev.astype(np.int32)
    ul = np.zeros_like(up)
    ul[bpp:] = up[:-bpp]
    if ft == 0:
        out = cur
    elif ft == 1:
        out = cur - left
    elif ft == 2:
        out = cur - up
    elif ft == 3:
        out = cur - (left + up) // 2
    elif ft == 4:
        out = cur - _paeth(left, up, ul)
    else:
        raise ValueError(f"bad filter {ft}")
    return (out % 256).astype(np.uint8)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))


# --------------------------------------------------------------------------
# Decoders
# --------------------------------------------------------------------------


def _decode_png(data: bytes):
    """→ (width, height, channels, pixels: (h, w*ch) uint8) or None."""
    if not data.startswith(_PNG_SIG):
        return None
    pos = 8
    w = h = None
    color = depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    ch = {0: 1, 2: 3, 6: 4}.get(color)
    if w is None or ch is None or depth != 8 or interlace != 0:
        return None  # honest partial coverage: gray/RGB/RGBA 8-bit only
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * ch
    if raw.size != h * (stride + 1):
        return None
    raw = raw.reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = int(raw[y, 0])
        f = raw[y, 1:].astype(np.int32)
        if ft == 0:
            rec = f
        elif ft == 2:
            rec = (f + prev) % 256
        elif ft in (1, 3, 4):
            # left-dependent filters: per-pixel scan across the row,
            # vectorized over the bpp byte lanes (rows are short; the
            # batch-level parallelism is Ray's)
            rec = np.empty(stride, dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            ul = np.zeros(ch, dtype=np.int32)
            for x in range(0, stride, ch):
                up = prev[x : x + ch]
                if ft == 1:
                    val = f[x : x + ch] + left
                elif ft == 3:
                    val = f[x : x + ch] + (left + up) // 2
                else:
                    val = f[x : x + ch] + _paeth(left, up, ul)
                val %= 256
                rec[x : x + ch] = val
                left = val
                ul = up.astype(np.int32)
        else:
            return None
        out[y] = rec.astype(np.uint8)
        prev = rec if rec.dtype == np.int32 else rec.astype(np.int32)
    return int(w), int(h), ch, out


def _decode_bmp(data: bytes):
    """→ (width, height, 3, pixels: (h, w*3) uint8 RGB) or None."""
    if len(data) < 54 or data[:2] != b"BM":
        return None
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (dib_size,) = struct.unpack_from("<I", data, 14)
    if dib_size < 40:
        return None
    w, h_signed = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0 or w <= 0 or h_signed == 0:
        return None
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    body = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=pix_off)
    rows = body.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:
        rows = rows[::-1]  # bottom-up storage → top-down
    return int(w), int(h), 3, rows[:, :, ::-1].reshape(h, w * 3)  # BGR → RGB


_LUM = np.array([0.299, 0.587, 0.114])


def _luminance(pixels: np.ndarray, ch: int) -> np.ndarray:
    px = pixels.reshape(-1, ch).astype(np.float64)
    if ch == 1:
        return px[:, 0]
    return px[:, :3] @ _LUM


MEDIA_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("n_bytes", pa.int64()),
        ("format", pa.string()),
        ("width", pa.int64()),
        ("height", pa.int64()),
        ("channels", pa.int64()),
        ("mean_lum", pa.float64()),
        ("std_lum", pa.float64()),
        ("digest", pa.string()),
    ]
)


class RealDecoder:
    """Actual byte-level image decode (PNG/BMP, see module docstring).
    Actor state (``__init__`` once per actor, ST1) holds the dispatch
    table — the stand-in for a model/codec load."""

    def __init__(self) -> None:
        self._sniffers = ((_PNG_SIG[:4], "png", _decode_png), (b"BM", "bmp", _decode_bmp))

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {name: [] for name in MEDIA_SCHEMA.names}
        urls = batch["url"].to_pylist()
        for url, payload in zip(urls, batch["payload"].to_pylist()):
            b = payload or b""
            fmt, decoded = "unsupported", None
            for magic, name, fn in self._sniffers:
                if b.startswith(magic):
                    decoded = fn(b)
                    fmt = name if decoded is not None else "unsupported"
                    break
            rows["url"].append(url)
            rows["n_bytes"].append(len(b))
            rows["digest"].append(hashlib.blake2b(b, digest_size=8).hexdigest())
            if decoded is None:
                rows["format"].append(fmt)
                rows["width"].append(0)
                rows["height"].append(0)
                rows["channels"].append(0)
                rows["mean_lum"].append(0.0)
                rows["std_lum"].append(0.0)
                continue
            w, h, ch, px = decoded
            lum = _luminance(px, ch)
            rows["format"].append(fmt)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["channels"].append(ch)
            rows["mean_lum"].append(float(lum.mean()))
            rows["std_lum"].append(float(lum.std()))
        return pa.table(rows, schema=MEDIA_SCHEMA)


class FakeDecoder:
    """Deterministic stand-in for an image decoder (actor state = the
    'model'/decoder tables, built once per actor). Kept for plumbing
    tests that need arbitrary binary payloads."""

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


def synth_image_table(n: int, *, seed: int = 7) -> pa.Table:
    """Deterministic (url, payload) fixture: seeded gradient+noise images
    encoded as real PNGs (cycling gray/RGB/RGBA × the five scanline
    filters) and BMPs, plus one non-image payload per 10 rows."""
    rng = np.random.default_rng(seed)
    urls, payloads = [], []
    for i in range(n):
        w = 8 + int(rng.integers(0, 25))
        h = 6 + int(rng.integers(0, 19))
        base = (
            np.linspace(0, 255, w, dtype=np.float64)[None, :]
            + np.linspace(0, 64, h, dtype=np.float64)[:, None]
        )
        noise = rng.integers(0, 32, size=(h, w))
        gray = ((base + noise) % 256).astype(np.uint8)
        kind = i % 10
        if kind < 4:  # PNG gray/rgb/rgba across filters 0..4
            ft = i % 5
            if kind == 0:
                payloads.append(encode_png(gray, filter_type=ft))
            elif kind == 1:
                rgb = np.stack([gray, gray[:, ::-1], 255 - gray], axis=2)
                payloads.append(encode_png(rgb, filter_type=ft))
            else:
                rgba = np.stack([gray, 255 - gray, gray, np.full_like(gray, 200)], axis=2)
                payloads.append(encode_png(rgba, filter_type=ft))
        elif kind < 9:
            rgb = np.stack([gray, np.roll(gray, 3, axis=1), 255 - gray], axis=2)
            payloads.append(encode_bmp(rgb))
        else:
            payloads.append(b"%PDF-1.4 not an image " + bytes(gray[0].tobytes()))
        urls.append(f"https://img.example/{i}")
    return pa.table({"url": pa.array(urls, pa.string()), "payload": pa.array(payloads, pa.binary())})


def resize_nearest(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, ch) uint8 array via a pure
    numpy index gather (pixel-center sampling, the classic NN mapping
    src = floor((dst + 0.5) * scale))."""
    h, w = px.shape[:2]
    ys = np.minimum(((np.arange(out_h) + 0.5) * (h / out_h)).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * (w / out_w)).astype(np.int64), w - 1)
    return px[ys][:, xs]


THUMB_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("format", pa.string()),
        ("src_width", pa.int64()),
        ("src_height", pa.int64()),
        ("thumb_width", pa.int64()),
        ("thumb_height", pa.int64()),
        ("channels", pa.int64()),
        ("thumb", pa.binary()),  # row-major uint8, h*w*ch bytes
        ("mean_lum", pa.float64()),
    ]
)


class Thumbnailer:
    """Decode + resize to a fixed thumbnail (the 'resize' leg of the
    multimodal story): emits the raw thumbnail bytes as a binary column
    so a downstream stage (embedding model, perceptual hash) can consume
    fixed-shape input without re-decoding. Unsupported payloads degrade
    per-row to an empty thumb."""

    def __init__(self, *, thumb_h: int = 16, thumb_w: int = 16) -> None:
        self.th, self.tw = thumb_h, thumb_w
        self._sniffers = ((_PNG_SIG[:4], "png", _decode_png), (b"BM", "bmp", _decode_bmp))

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {name: [] for name in THUMB_SCHEMA.names}
        urls = batch["url"].to_pylist()
        for url, payload in zip(urls, batch["payload"].to_pylist()):
            b = payload or b""
            fmt, decoded = "unsupported", None
            for magic, name, fn in self._sniffers:
                if b.startswith(magic):
                    decoded = fn(b)
                    fmt = name if decoded is not None else "unsupported"
                    break
            rows["url"].append(url)
            rows["format"].append(fmt)
            if decoded is None:
                for k in ("src_width", "src_height", "thumb_width", "thumb_height", "channels"):
                    rows[k].append(0)
                rows["thumb"].append(b"")
                rows["mean_lum"].append(0.0)
                continue
            w, h, ch, px = decoded
            thumb = resize_nearest(px.reshape(h, w, ch), self.th, self.tw)
            rows["src_width"].append(w)
            rows["src_height"].append(h)
            rows["thumb_width"].append(self.tw)
            rows["thumb_height"].append(self.th)
            rows["channels"].append(ch)
            rows["thumb"].append(thumb.tobytes())
            rows["mean_lum"].append(float(_luminance(thumb.reshape(self.th, -1), ch).mean()))
        return pa.table(rows, schema=THUMB_SCHEMA)


def media_thumbnails_stage(ds, *, thumb_h: int = 16, thumb_w: int = 16,
                           batch_size: int = 128, concurrency=(1, 4)):
    """(url, payload: binary) → fixed-size thumbnails (``THUMB_SCHEMA``)."""
    return ds.map_batches(
        Thumbnailer,
        fn_constructor_kwargs={"thumb_h": thumb_h, "thumb_w": thumb_w},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


# --------------------------------------------------------------------------
# Perceptual-hash (dHash) image dedup
# --------------------------------------------------------------------------


def dhash64(px: np.ndarray, ch: int) -> int:
    """64-bit difference hash: luminance → 8×9 nearest-neighbor reduce →
    horizontal gradient sign → 64 bits. Encoding-invariant: any payload
    with the same pixels (PNG vs BMP, any scanline filter) hashes
    identically, so grouping by dhash finds duplicates a byte digest
    can never pair."""
    h, w = px.shape[0], px.shape[1] // ch
    lum = _luminance(px, ch).reshape(h, w)
    small = resize_nearest(lum[:, :, None], 8, 9)[:, :, 0]
    bits = (small[:, 1:] > small[:, :-1]).ravel()
    return int(np.packbits(bits).view(">u8")[0])


class PerceptualHasher:
    """(url, payload) → (url, format, dhash, digest). dhash is the
    pixel-level identity key; digest is the byte-level one — rows where
    the two disagree across a group are re-encodes of the same image."""

    def __init__(self) -> None:
        self._sniffers = ((_PNG_SIG[:4], "png", _decode_png), (b"BM", "bmp", _decode_bmp))

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        fmts, hashes, digests = [], [], []
        for b in batch["payload"].to_pylist():
            b = b or b""
            fmt, decoded = "unsupported", None
            for magic, name, fn in self._sniffers:
                if b.startswith(magic):
                    decoded = fn(b)
                    fmt = name if decoded is not None else "unsupported"
                    break
            fmts.append(fmt)
            digests.append(hashlib.blake2b(b, digest_size=8).hexdigest())
            if decoded is None:
                hashes.append(None)
                continue
            w, h, ch, px = decoded
            hashes.append(np.int64(np.uint64(dhash64(px, ch))).item())
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "format": pa.array(fmts, pa.string()),
                "dhash": pa.array(hashes, pa.int64()),
                "digest": pa.array(digests, pa.string()),
            }
        )


def image_dedup_stage(ds, *, batch_size: int = 128, concurrency=(1, 4)):
    """Cross-encoding image dedup: hash every payload (actor-pool map),
    then one hash-bucketed exchange groups pixel-identical images —
    exactly the exact-dedup plan (D3) with dhash as the content key.
    Emits one row per duplicate GROUP (n_copies ≥ 2): the keeper (first
    url in lexical order — deterministic survivorship), copy count, and
    how many distinct byte digests the group spans (re-encodes)."""
    from .util import grouped_agg

    hashed = ds.map_batches(
        PerceptualHasher,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    ).map_batches(
        lambda t: t.filter(pc.is_valid(t["dhash"])), batch_format="pyarrow"
    )

    groups = grouped_agg(
        hashed,
        ["dhash"],
        {
            "keeper_url": ("url", "min"),
            "n_copies": ("url", "count"),
            "n_encodings": ("digest", "nunique"),
        },
    )
    return groups.filter(expr="n_copies >= 2")


def synth_dup_image_table(n_families: int, *, seed: int = 17) -> pa.Table:
    """Deterministic fixture with PLANTED cross-encoding duplicates:
    every 3rd family is one RGB image re-encoded 3 ways with different
    bytes (PNG filter 0, PNG filter 4, BMP) — same pixels, three
    distinct byte digests; the rest are singletons. Ground truth:
    ``n_families // 3 + (1 if n_families % 3 else 0)`` … computed the
    simple way in tests: families ≡ 0 (mod 3) are the dup groups."""
    rng = np.random.default_rng(seed)
    urls, payloads = [], []
    for i in range(n_families):
        w = 10 + int(rng.integers(0, 15))
        h = 8 + int(rng.integers(0, 11))
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        if i % 3 == 0:
            for j, blob in enumerate(
                (encode_png(rgb, filter_type=0), encode_png(rgb, filter_type=4), encode_bmp(rgb))
            ):
                urls.append(f"https://img.example/f{i}/v{j}")
                payloads.append(blob)
        else:
            urls.append(f"https://img.example/f{i}/v0")
            payloads.append(encode_png(rgb, filter_type=i % 5))
    return pa.table({"url": pa.array(urls, pa.string()), "payload": pa.array(payloads, pa.binary())})


def media_features_stage(ds, *, batch_size: int = 128, concurrency=(1, 4), real: bool = True):
    """(url, payload: binary) → typed feature rows (``MEDIA_SCHEMA`` for
    the real decoder). Small batch_size: payloads are wide binary rows —
    batch × concurrency must fit worker heap (SURVEY.md §4.2 memory
    row)."""
    return ds.map_batches(
        RealDecoder if real else FakeDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
