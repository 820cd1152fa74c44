"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video ride as ``binary`` columns + metadata (format, width,
height, ...). The decode/feature kernels themselves are STUBBED (image/audio
libraries are not in this container — north-rule instruction), but all the
Ray-side plumbing is real and tested: actor-pool signature, per-batch
schema-in/schema-out contract, byte-budgeted batch sizing, deterministic
fake decode so pipelines are end-to-end runnable.

At 100 TB the payload column dominates memory: callers should use a SMALL
``batch_size`` (bytes per batch = batch_size x mean payload size must fit the
worker heap) — see ``suggested_batch_size``.
"""

from __future__ import annotations

import hashlib
from typing import Any, Optional

import numpy as np
import pyarrow as pa

from ray.data import Dataset

__all__ = ["ImageFeatureExtractor", "add_image_features",
           "FrameSampler", "AudioFrameFeatures", "audio_frame_features",
           "MediaHeaderProbe", "probe_media_headers", "wrap_pcm_wav",
           "make_mp4_header", "make_mp4_sampled", "make_mp4_multitrack",
           "probe_mp4_samples",
           "MP4SampleProbe", "make_mkv_header", "suggested_batch_size",
           "make_bmp", "decode_bmp", "dhash64", "DHasher", "image_dhash",
           "synth_image_pixels", "decode_wav_pcm16", "audio_fp64",
           "AudioFingerprinter", "audio_fingerprint", "synth_audio_pcm",
           "make_jpeg_exif", "parse_jpeg_exif", "ExifProbe", "probe_exif",
           "make_ogg_opus_header", "make_ogg_vorbis_header",
           "ImagePatcher", "image_patch_features"]

IMAGE_META_SCHEMA = pa.schema([
    ("payload", pa.large_binary()),
    ("format", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])


def suggested_batch_size(mean_payload_bytes: int,
                         heap_budget_bytes: int = 512 * 1024 * 1024) -> int:
    """Rows per batch so payload x rows stays inside the actor heap budget."""
    return max(1, int(heap_budget_bytes // max(1, mean_payload_bytes)))


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401
        return Image
    except ImportError:
        return None


class ImageFeatureExtractor:
    """Actor: decode + feature-extract image payloads.

    Real decode path requires PIL (absent in this container): with
    ``strict=True`` it raises NotImplementedError; the default deterministic
    fake derives stable pseudo-features from the payload bytes so the
    pipeline plumbing (schema, batching, actor reuse) is fully exercised.
    """

    def __init__(self, payload_column: str = "payload", strict: bool = False,
                 resize_to: tuple[int, int] = (224, 224)):
        self.payload_column = payload_column
        self.resize_to = resize_to
        self.pil = _try_import_pil()
        if strict and self.pil is None:
            raise NotImplementedError(
                "image decode requires PIL, which is not available in this "
                "environment; run with strict=False for the deterministic "
                "fake-decode path")

    def _fake_features(self, payload: bytes) -> tuple[int, int, float, float]:
        # deterministic pseudo-decode: stable per payload byte content
        d = hashlib.sha256(payload or b"").digest()
        width = 64 + d[0] * 8
        height = 64 + d[1] * 8
        mean_luma = d[2] / 255.0
        sharpness = d[3] / 255.0
        return width, height, mean_luma, sharpness

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_column).to_pylist()
        widths, heights, lumas, sharps = [], [], [], []
        for p in payloads:
            if self.pil is not None:
                import io
                try:
                    img = self.pil.open(io.BytesIO(p))
                    widths.append(img.width)     # ORIGINAL dims, pre-resize
                    heights.append(img.height)
                    img = img.resize(self.resize_to)
                    arr = np.asarray(img.convert("L"), dtype=np.float64)
                    lumas.append(float(arr.mean()) / 255.0)
                    gy, gx = np.gradient(arr)
                    sharps.append(float(np.sqrt(gx ** 2 + gy ** 2).mean()) / 255.0)
                    continue
                except Exception:
                    pass
            w, h, l, s = self._fake_features(p)
            widths.append(w)
            heights.append(h)
            lumas.append(l)
            sharps.append(s)
        batch = batch.append_column("img_width", pa.array(widths, type=pa.int32()))
        batch = batch.append_column("img_height", pa.array(heights, type=pa.int32()))
        batch = batch.append_column("mean_luma", pa.array(lumas, type=pa.float64()))
        batch = batch.append_column("sharpness", pa.array(sharps, type=pa.float64()))
        return batch


def add_image_features(ds: Dataset, payload_column: str = "payload",
                       batch_size: int = 64, concurrency=None) -> Dataset:
    """Actor-pool image feature stage; small batch_size by design (payload
    bytes dominate — see suggested_batch_size)."""
    return ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={"payload_column": payload_column},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or (1, 8))


class AudioFrameFeatures:
    """Windowed audio features over RAW PCM payloads — a REAL kernel.

    Raw 16-bit little-endian mono PCM needs no codec library, so unlike the
    image path this stage computes genuine per-window features: RMS energy
    and zero-crossing rate per ``frame_ms`` window at ``hop_ms`` stride
    (numpy sliding windows — vectorized per payload, no per-sample Python).
    Compressed formats (mp3/ogg/flac) would need a codec that is absent in
    this container: payloads whose ``format`` metadata is not ``pcm16`` /
    ``raw`` raise NotImplementedError in strict mode, or emit zero frames
    otherwise (documented stub boundary).

    Flat-map semantics: one input row -> one row per window
    (id, frame_index, t_start_s, rms, zcr).
    """

    RAW_FORMATS = ("pcm16", "raw", None, "")

    def __init__(self, payload_column: str = "payload", id_column: str = "id",
                 format_column: str | None = None, sample_rate: int = 16000,
                 frame_ms: int = 25, hop_ms: int = 10, strict: bool = False):
        self.payload_column = payload_column
        self.id_column = id_column
        self.format_column = format_column
        self.sample_rate = sample_rate
        self.frame = max(1, sample_rate * frame_ms // 1000)
        self.hop = max(1, sample_rate * hop_ms // 1000)
        self.strict = strict

    def _features(self, pcm: np.ndarray):
        from numpy.lib.stride_tricks import sliding_window_view
        if len(pcm) < self.frame:
            pcm = np.pad(pcm, (0, self.frame - len(pcm)))
        wins = sliding_window_view(pcm, self.frame)[::self.hop]
        x = wins.astype(np.float64) / 32768.0
        rms = np.sqrt((x * x).mean(axis=1))
        zcr = (np.diff(np.signbit(wins), axis=1) != 0).mean(axis=1)
        return rms, zcr

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_pylist()
        payloads = batch.column(self.payload_column).to_pylist()
        formats = (batch.column(self.format_column).to_pylist()
                   if self.format_column and
                   self.format_column in batch.schema.names
                   else [None] * len(ids))
        out_id, out_idx, out_t, out_rms, out_zcr = [], [], [], [], []
        for rid, p, fmt in zip(ids, payloads, formats):
            if fmt not in self.RAW_FORMATS:
                if self.strict:
                    raise NotImplementedError(
                        f"audio format {fmt!r} needs a codec library that is "
                        "not available in this environment (raw pcm16 only)")
                continue
            p = p or b""
            pcm = np.frombuffer(p[:len(p) - (len(p) % 2)], dtype="<i2")
            if len(pcm) == 0:
                continue
            rms, zcr = self._features(pcm)
            n = len(rms)
            out_id.extend([rid] * n)
            out_idx.extend(range(n))
            out_t.extend((np.arange(n) * self.hop / self.sample_rate).tolist())
            out_rms.extend(rms.tolist())
            out_zcr.extend(zcr.tolist())
        # typed audio_id even when every payload was skipped/empty — a
        # null-typed empty column would break concat with row-producing
        # blocks downstream
        id_type = batch.schema.field(self.id_column).type
        return pa.table({
            "audio_id": pa.array(out_id, type=id_type),
            "frame_index": pa.array(out_idx, type=pa.int32()),
            "t_start_s": pa.array(out_t, type=pa.float64()),
            "rms": pa.array(out_rms, type=pa.float64()),
            "zcr": pa.array(out_zcr, type=pa.float64())})


def audio_frame_features(ds: Dataset, payload_column: str = "payload",
                         id_column: str = "id",
                         format_column: str | None = None,
                         batch_size: int = 64, concurrency=None,
                         **kwargs) -> Dataset:
    """Actor-pool audio windowing stage (small batches: payloads dominate)."""
    from . import cached_stage, concurrency_kwargs
    return ds.map_batches(
        cached_stage(AudioFrameFeatures, payload_column=payload_column,
                     id_column=id_column, format_column=format_column,
                     **kwargs),
        batch_format="pyarrow", batch_size=batch_size,
        **concurrency_kwargs(concurrency))


def wrap_pcm_wav(pcm_bytes: bytes, sample_rate: int = 16000,
                 channels: int = 1, bits: int = 16) -> bytes:
    """Wrap raw PCM bytes in a canonical RIFF/WAVE header (44-byte PCM
    header, no codec needed). Odd-length payloads are truncated to the
    sample boundary. Deterministic — usable to synthesize real WAV
    payloads in tests and pipelines."""
    block = channels * bits // 8
    pcm_bytes = pcm_bytes[:len(pcm_bytes) - (len(pcm_bytes) % block)]
    data_size = len(pcm_bytes)
    byte_rate = sample_rate * block
    import struct
    hdr = (b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels,
                                   sample_rate, byte_rate, block, bits)
           + b"data" + struct.pack("<I", data_size))
    return hdr + pcm_bytes


def make_mp4_header(width: int, height: int, duration_units: int,
                    timescale: int = 1000) -> bytes:
    """Minimal valid ISO-BMFF header (ftyp + moov[mvhd + trak[tkhd]]),
    dependency-free and deterministic — usable to synthesize real MP4
    headers in tests and pipelines (no media data, header-only)."""
    import struct

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    mvhd = box(b"mvhd",
               b"\x00\x00\x00\x00"                 # version/flags
               + struct.pack(">II", 0, 0)           # ctime, mtime
               + struct.pack(">II", timescale, duration_units)
               + struct.pack(">I", 0x00010000)      # rate 1.0
               + struct.pack(">H", 0x0100)          # volume 1.0
               + b"\x00" * 10                       # reserved
               + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000)            # unity matrix
               + b"\x00" * 24                       # predefined
               + struct.pack(">I", 2))              # next track id
    tkhd = box(b"tkhd",
               b"\x00\x00\x00\x07"                  # version/flags (enabled)
               + struct.pack(">IIII", 0, 0, 1, 0)   # ctime mtime id res
               + struct.pack(">I", duration_units)
               + b"\x00" * 8                        # reserved
               + struct.pack(">HHHH", 0, 0, 0, 0)   # layer alt vol res
               + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000)
               + struct.pack(">II", width << 16, height << 16))
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    return ftyp + box(b"moov", mvhd + box(b"trak", tkhd))


def make_mp4_sampled(width: int, height: int, timescale: int,
                     sample_deltas: "list[int]",
                     sample_sizes: "int | list[int]") -> bytes:
    """Valid ISO-BMFF header WITH a sample table (ftyp + moov[mvhd +
    trak[tkhd + mdia[mdhd + minf[stbl[stts + stsz]]]]]) — dependency-free
    and deterministic, usable to synthesize per-frame metadata for the
    sample-table probe.  ``sample_deltas`` is one media-timescale delta
    per sample (adjacent equal deltas are run-length-collapsed into stts
    entries, the spec's canonical form); ``sample_sizes`` is either one
    int (stsz fixed-size branch) or a per-sample list (table branch)."""
    import struct

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    n = len(sample_deltas)
    duration = sum(sample_deltas)
    # run-length collapse (count, delta) pairs
    entries = []
    for d in sample_deltas:
        if entries and entries[-1][1] == d:
            entries[-1][0] += 1
        else:
            entries.append([1, d])
    stts = box(b"stts", b"\x00\x00\x00\x00"
               + struct.pack(">I", len(entries))
               + b"".join(struct.pack(">II", c, d) for c, d in entries))
    if isinstance(sample_sizes, int):
        stsz = box(b"stsz", b"\x00\x00\x00\x00"
                   + struct.pack(">II", sample_sizes, n))
    else:
        if len(sample_sizes) != n:
            raise ValueError("sample_sizes length != sample count")
        stsz = box(b"stsz", b"\x00\x00\x00\x00"
                   + struct.pack(">II", 0, n)
                   + b"".join(struct.pack(">I", s) for s in sample_sizes))
    mdhd = box(b"mdhd", b"\x00\x00\x00\x00"
               + struct.pack(">II", 0, 0)
               + struct.pack(">II", timescale, duration)
               + struct.pack(">HH", 0x55C4, 0))     # language 'und'
    mdia = box(b"mdia", mdhd + box(b"minf", box(b"stbl", stts + stsz)))
    mvhd = box(b"mvhd",
               b"\x00\x00\x00\x00"
               + struct.pack(">II", 0, 0)
               + struct.pack(">II", timescale, duration)
               + struct.pack(">I", 0x00010000)
               + struct.pack(">H", 0x0100)
               + b"\x00" * 10
               + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000)
               + b"\x00" * 24
               + struct.pack(">I", 2))
    tkhd = box(b"tkhd",
               b"\x00\x00\x00\x07"
               + struct.pack(">IIII", 0, 0, 1, 0)
               + struct.pack(">I", duration)
               + b"\x00" * 8
               + struct.pack(">HHHH", 0, 0, 0, 0)
               + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000)
               + struct.pack(">II", width << 16, height << 16))
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    return ftyp + box(b"moov", mvhd + box(b"trak", tkhd + mdia))


def make_mp4_multitrack(tracks, width: int = 640,
                        height: int = 480) -> bytes:
    """Multi-track sibling of :func:`make_mp4_sampled`: one ``trak``
    per ``(timescale, sample_deltas, sample_sizes)`` tuple under a
    single ``moov`` — dependency-free, deterministic, for exercising the
    per-track aggregation of :class:`MP4SampleProbe`."""
    import struct

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    def trak(timescale, sample_deltas, sample_sizes) -> bytes:
        n = len(sample_deltas)
        duration = sum(sample_deltas)
        entries = []
        for d in sample_deltas:
            if entries and entries[-1][1] == d:
                entries[-1][0] += 1
            else:
                entries.append([1, d])
        stts = box(b"stts", b"\x00\x00\x00\x00"
                   + struct.pack(">I", len(entries))
                   + b"".join(struct.pack(">II", c, d)
                              for c, d in entries))
        if isinstance(sample_sizes, int):
            stsz = box(b"stsz", b"\x00\x00\x00\x00"
                       + struct.pack(">II", sample_sizes, n))
        else:
            if len(sample_sizes) != n:
                raise ValueError("sample_sizes length != sample count")
            stsz = box(b"stsz", b"\x00\x00\x00\x00"
                       + struct.pack(">II", 0, n)
                       + b"".join(struct.pack(">I", s)
                                  for s in sample_sizes))
        mdhd = box(b"mdhd", b"\x00\x00\x00\x00"
                   + struct.pack(">II", 0, 0)
                   + struct.pack(">II", timescale, duration)
                   + struct.pack(">HH", 0x55C4, 0))
        mdia = box(b"mdia", mdhd + box(b"minf", box(b"stbl", stts + stsz)))
        tkhd = box(b"tkhd",
                   b"\x00\x00\x00\x07"
                   + struct.pack(">IIII", 0, 0, 1, 0)
                   + struct.pack(">I", duration)
                   + b"\x00" * 8
                   + struct.pack(">HHHH", 0, 0, 0, 0)
                   + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0,
                                 0, 0x40000000)
                   + struct.pack(">II", width << 16, height << 16))
        return box(b"trak", tkhd + mdia)

    if not tracks:
        raise ValueError("make_mp4_multitrack: at least one track")
    ts0, deltas0, _ = tracks[0]
    mvhd = box(b"mvhd",
               b"\x00\x00\x00\x00"
               + struct.pack(">II", 0, 0)
               + struct.pack(">II", ts0, sum(deltas0))
               + struct.pack(">I", 0x00010000)
               + struct.pack(">H", 0x0100)
               + b"\x00" * 10
               + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000)
               + b"\x00" * 24
               + struct.pack(">I", len(tracks) + 1))
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    body = mvhd + b"".join(trak(*t) for t in tracks)
    return ftyp + box(b"moov", body)


class MP4SampleProbe:
    """ISO-BMFF sample-table parser: per-track frame counts and byte
    totals from the ``stbl`` boxes — the per-frame metadata a video
    curation pipeline keys on (fps, frame count, mean frame size)
    WITHOUT decoding anything.

    Walks moov/trak/mdia/minf/stbl of the FIRST track carrying both an
    stts and an stsz box (plus mdhd for the media timescale):

    - ``stts`` (decoding time-to-sample): sample count = sum of entry
      counts; media duration = sum(count x delta).
    - ``stsz`` (sample sizes): total bytes = fixed_size x count, or the
      per-sample table sum when fixed_size == 0.
    - ``mp4_fps`` = (n_samples x timescale) / duration_units — integer
      numerator, ONE IEEE division (SQL-replayable bit-exactly).

    Appends ``mp4_n_tracks``, ``mp4_n_samples``, ``mp4_sample_bytes``,
    ``mp4_media_timescale``, ``mp4_media_duration_units`` (int64 | null)
    and ``mp4_fps`` (float64 | null) for the FIRST sample-table track,
    plus the PER-TRACK aggregation over every sample-table track in file
    order: ``mp4_total_samples`` (int64) and ``mp4_track_samples`` (the
    per-track frame counts as a comma-joined string — SQL-replayable);
    all null for non-MP4 payloads, truncated boxes, or tracks without a
    sample table.  Per-payload work is a few dozen byte reads — O(rows),
    not O(bytes), same boundary as MediaHeaderProbe."""

    def __init__(self, payload_column: str = "payload"):
        self.payload_column = payload_column

    @staticmethod
    def _parse(p: bytes):
        import struct
        if p is None or len(p) < 16 or p[4:8] != b"ftyp":
            return None

        def boxes(start, end):
            i = start
            while i + 8 <= end:
                size = int.from_bytes(p[i:i + 4], "big")
                typ = p[i + 4:i + 8]
                hdr = 8
                if size == 1:
                    if i + 16 > end:
                        return
                    size = int.from_bytes(p[i + 8:i + 16], "big")
                    hdr = 16
                elif size == 0:
                    size = end - i
                if size < hdr or i + size > end:
                    return
                yield typ, i + hdr, i + size
                i += size

        out = {"n_tracks": 0}

        def parse_stbl(s, e, track):
            for typ, bs, be in boxes(s, e):
                if typ == b"stts" and be - bs >= 8:
                    cnt = int.from_bytes(p[bs + 4:bs + 8], "big")
                    if be - bs < 8 + 8 * cnt:
                        continue
                    ns = dur = 0
                    for j in range(cnt):
                        o = bs + 8 + 8 * j
                        c = int.from_bytes(p[o:o + 4], "big")
                        d = int.from_bytes(p[o + 4:o + 8], "big")
                        ns += c
                        dur += c * d
                    track["n_samples"] = ns
                    track["duration_units"] = dur
                elif typ == b"stsz" and be - bs >= 12:
                    fixed = int.from_bytes(p[bs + 4:bs + 8], "big")
                    cnt = int.from_bytes(p[bs + 8:bs + 12], "big")
                    if fixed:
                        track["sample_bytes"] = fixed * cnt
                    elif be - bs >= 12 + 4 * cnt:
                        track["sample_bytes"] = sum(
                            int.from_bytes(p[bs + 12 + 4 * j:
                                             bs + 16 + 4 * j], "big")
                            for j in range(cnt))

        def walk(start, end, depth=0):
            for typ, s, e in boxes(start, end):
                if typ == b"moov":
                    walk(s, e, 1)
                elif typ == b"trak" and depth == 1:
                    out["n_tracks"] += 1
                    track = {}
                    for t2, s2, e2 in boxes(s, e):
                        if t2 == b"mdia":
                            for t3, s3, e3 in boxes(s2, e2):
                                if t3 == b"mdhd" and e3 - s3 >= 20:
                                    v = p[s3]
                                    off = s3 + (20 if v == 1 else 12)
                                    track["timescale"] = int.from_bytes(
                                        p[off:off + 4], "big")
                                elif t3 == b"minf":
                                    for t4, s4, e4 in boxes(s3, e3):
                                        if t4 == b"stbl":
                                            parse_stbl(s4, e4, track)
                    if "n_samples" in track and "sample_bytes" in track:
                        out.setdefault("tracks", []).append(track)
                        if "track" not in out:
                            out["track"] = track

        walk(0, len(p))
        return out if out["n_tracks"] else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.payload_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n_tracks, ns, sb, ts, du, fps = [], [], [], [], [], []
        tot, per = [], []
        for v in col:
            info = self._parse(v.as_py() if v.is_valid else None)
            if info is None:
                n_tracks.append(None)
                ns.append(None), sb.append(None)
                ts.append(None), du.append(None), fps.append(None)
                tot.append(None), per.append(None)
                continue
            n_tracks.append(info["n_tracks"])
            trs = info.get("tracks", [])
            if trs:
                tot.append(sum(t["n_samples"] for t in trs))
                per.append(",".join(str(t["n_samples"]) for t in trs))
            else:
                tot.append(None), per.append(None)
            tr = info.get("track")
            if tr is None:
                ns.append(None), sb.append(None)
                ts.append(None), du.append(None), fps.append(None)
                continue
            ns.append(tr["n_samples"])
            sb.append(tr["sample_bytes"])
            ts.append(tr.get("timescale"))
            du.append(tr.get("duration_units"))
            ok = (tr.get("timescale") and tr.get("duration_units")
                  and tr["n_samples"])
            fps.append((tr["n_samples"] * tr["timescale"])
                       / tr["duration_units"] if ok else None)
        return (batch
                .append_column("mp4_n_tracks", pa.array(n_tracks,
                                                        pa.int64()))
                .append_column("mp4_n_samples", pa.array(ns, pa.int64()))
                .append_column("mp4_sample_bytes", pa.array(sb, pa.int64()))
                .append_column("mp4_media_timescale",
                               pa.array(ts, pa.int64()))
                .append_column("mp4_media_duration_units",
                               pa.array(du, pa.int64()))
                .append_column("mp4_fps", pa.array(fps, pa.float64()))
                .append_column("mp4_total_samples",
                               pa.array(tot, pa.int64()))
                .append_column("mp4_track_samples",
                               pa.array(per, pa.string())))


def probe_mp4_samples(ds: Dataset, payload_column: str = "payload",
                      batch_size: int = 256, concurrency=None) -> Dataset:
    """Actor-pool MP4 sample-table probe (real stts/stsz/mdhd parsing)."""
    from . import cached_stage, concurrency_kwargs
    return ds.map_batches(
        cached_stage(MP4SampleProbe, payload_column=payload_column),
        batch_format="pyarrow", batch_size=batch_size,
        **concurrency_kwargs(concurrency))


def make_flac_header(sample_rate: int, channels: int, bits_per_sample: int,
                     total_samples: int) -> bytes:
    """Minimal valid FLAC header (magic + last-flagged STREAMINFO block),
    dependency-free and deterministic — header-only, no audio frames."""
    if not (1 <= channels <= 8 and 4 <= bits_per_sample <= 32
            and 0 < sample_rate < (1 << 20)
            and 0 <= total_samples < (1 << 36)):
        raise ValueError("make_flac_header: field out of FLAC range")
    u = ((sample_rate << 44) | ((channels - 1) << 41)
         | ((bits_per_sample - 1) << 36) | total_samples)
    streaminfo = (
        (4096).to_bytes(2, "big") * 2       # min/max block size
        + b"\x00" * 6                        # min/max frame size (unknown)
        + u.to_bytes(8, "big")
        + b"\x00" * 16)                      # MD5 (unset)
    assert len(streaminfo) == 34
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + streaminfo


def _ebml_vint(n: int) -> bytes:
    """Minimal-length EBML size encoding (the all-ones pattern is reserved
    for 'unknown size', so each length tops out one below it)."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            return ((1 << (7 * length)) | n).to_bytes(length, "big")
    raise ValueError("EBML vint out of range")


def _ebml_elem(eid: bytes, payload: bytes) -> bytes:
    return eid + _ebml_vint(len(payload)) + payload


def make_mkv_header(width: int, height: int, duration_units: int,
                    timescale_ns: int = 1_000_000,
                    doc_type: str = "matroska",
                    sample_rate: "int | None" = None,
                    channels: "int | None" = None) -> bytes:
    """Minimal valid Matroska/WebM header (EBML header + Segment[Info +
    Tracks[video TrackEntry (+ optional audio TrackEntry)]]),
    dependency-free and deterministic — header-only, no clusters.
    ``duration_units`` is in timestamp-scale units (duration seconds =
    duration_units * timescale_ns / 1e9)."""
    import struct

    ebml = _ebml_elem(b"\x1aE\xdf\xa3",
                      _ebml_elem(b"\x42\x86", b"\x01")        # EBMLVersion
                      + _ebml_elem(b"\x42\x82",
                                   doc_type.encode("ascii"))  # DocType
                      + _ebml_elem(b"\x42\x87", b"\x04")      # DocTypeVersion
                      + _ebml_elem(b"\x42\x85", b"\x02"))     # ReadVersion
    info = _ebml_elem(b"\x15\x49\xa9\x66",
                      _ebml_elem(b"\x2a\xd7\xb1",
                                 timescale_ns.to_bytes(
                                     max(1, (timescale_ns.bit_length() + 7)
                                         // 8), "big"))
                      + _ebml_elem(b"\x44\x89",
                                   struct.pack(">d", float(duration_units))))
    video_entry = _ebml_elem(b"\xae",
                             _ebml_elem(b"\xd7", b"\x01")     # TrackNumber
                             + _ebml_elem(b"\x83", b"\x01")   # TrackType=video
                             + _ebml_elem(b"\xe0",            # Video
                                          _ebml_elem(b"\xb0", width.to_bytes(
                                              2, "big"))
                                          + _ebml_elem(b"\xba",
                                                       height.to_bytes(
                                                           2, "big"))))
    tracks = video_entry
    if sample_rate is not None:
        tracks += _ebml_elem(b"\xae",
                             _ebml_elem(b"\xd7", b"\x02")
                             + _ebml_elem(b"\x83", b"\x02")   # audio
                             + _ebml_elem(b"\xe1",
                                          _ebml_elem(b"\xb5", struct.pack(
                                              ">d", float(sample_rate)))
                                          + _ebml_elem(b"\x9f", bytes(
                                              [channels or 1]))))
    segment = _ebml_elem(b"\x18\x53\x80\x67",
                         info + _ebml_elem(b"\x16\x54\xae\x6b", tracks))
    return ebml + segment


#: MPEG-1 Layer III bitrate table (kbps), index 1..14 (0/15 invalid)
_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112,
                 128, 160, 192, 224, 256, 320)
_MP3_RATES = (44100, 48000, 32000)


def make_mp3_header(sample_rate: int, channels: int, bitrate_kbps: int,
                    n_data_bytes: int, id3_size: int = 32) -> bytes:
    """ID3v2 tag + one MPEG-1 Layer III frame header + zero data bytes —
    dependency-free and deterministic, for synthesizing real MP3 payloads
    in tests/oracles."""
    if sample_rate not in _MP3_RATES or channels not in (1, 2):
        raise ValueError("make_mp3_header: unsupported rate/channels")
    br_idx = _MP3_BITRATES.index(bitrate_kbps)
    sr_idx = _MP3_RATES.index(sample_rate)
    # synchsafe 28-bit size (7 bits per byte)
    ss = bytes(((id3_size >> s) & 0x7F) for s in (21, 14, 7, 0))
    id3 = b"ID3" + bytes((4, 0, 0)) + ss + b"\x00" * id3_size
    b1 = 0b11111011                       # MPEG-1 (11), Layer III (01), no CRC
    b2 = (br_idx << 4) | (sr_idx << 2)
    b3 = (0b11 if channels == 1 else 0b00) << 6
    return id3 + bytes((0xFF, b1, b2, b3)) + b"\x00" * n_data_bytes


def make_tiff_header(width: int, height: int, bits: int = 8,
                     samples: int = 3, big_endian: bool = False) -> bytes:
    """Minimal valid TIFF: byte-order magic + one IFD with SHORT entries
    for ImageWidth/ImageLength/BitsPerSample/SamplesPerPixel."""
    bo = "big" if big_endian else "little"

    def u(v: int, n: int) -> bytes:
        return v.to_bytes(n, bo)

    magic = (b"MM\x00\x2a" if big_endian else b"II\x2a\x00") + u(8, 4)
    entries = []
    for tag, val in ((256, width), (257, height), (258, bits),
                     (277, samples)):
        # tag(2) type(2=SHORT:3) count(4) value packed into first 2 bytes
        entries.append(u(tag, 2) + u(3, 2) + u(1, 4) + u(val, 2) + u(0, 2))
    ifd = u(len(entries), 2) + b"".join(entries) + u(0, 4)
    return magic + ifd


def _ogg_page(packet: bytes) -> bytes:
    """Wrap one packet (< 255 bytes) as a beginning-of-stream Ogg page."""
    assert len(packet) < 255
    return (b"OggS" + b"\x00" + b"\x02" + b"\x00" * 8
            + (1).to_bytes(4, "little") + (0).to_bytes(4, "little")
            + (0).to_bytes(4, "little") + bytes([1, len(packet)]) + packet)


def make_ogg_opus_header(channels: int, input_rate: int,
                         pre_skip: int = 312) -> bytes:
    """Minimal Ogg page carrying an OpusHead identification packet."""
    pkt = (b"OpusHead" + bytes([1, channels])
           + pre_skip.to_bytes(2, "little")
           + input_rate.to_bytes(4, "little")
           + (0).to_bytes(2, "little") + b"\x00")
    return _ogg_page(pkt)


def make_ogg_vorbis_header(channels: int, rate: int) -> bytes:
    """Minimal Ogg page carrying a Vorbis identification packet."""
    pkt = (b"\x01vorbis" + (0).to_bytes(4, "little") + bytes([channels])
           + rate.to_bytes(4, "little") + b"\x00" * 12
           + bytes([0x66]) + b"\x01")
    return _ogg_page(pkt)


class MediaHeaderProbe:
    """REAL (dependency-free) media container-header parser.

    Unlike the decode stubs above, container headers need no codec
    library: PNG IHDR, JPEG SOF, GIF, BMP, RIFF/WAVE ``fmt `` chunks, FLAC
    STREAMINFO and ISO-BMFF (MP4) boxes are plain struct layouts, so format
    detection + dimensions / channels / sample-rate / bit-depth / duration
    are parsed for real from the payload bytes. The per-payload work is a few dozen byte reads — O(rows), not
    O(payload bytes) — so the Python loop over rows is not a hot path.

    Output columns appended: ``media_format`` (string | null),
    ``media_width`` / ``media_height`` / ``media_channels`` /
    ``media_sample_rate`` / ``media_bit_depth`` (int32 | null),
    ``media_duration_s`` (float64 | null), ``header_ok`` (bool).
    """

    def __init__(self, payload_column: str = "payload"):
        self.payload_column = payload_column

    # -- per-format parsers (return dict of fields or None) ---------------
    @staticmethod
    def _png(p: bytes):
        if len(p) < 26 or p[:8] != b"\x89PNG\r\n\x1a\n" or p[12:16] != b"IHDR":
            return None
        w = int.from_bytes(p[16:20], "big")
        h = int.from_bytes(p[20:24], "big")
        bit_depth = p[24]
        color_type = p[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        if channels is None or not (0 < w < 2 ** 31 and 0 < h < 2 ** 31):
            return None
        return {"media_format": "png", "media_width": w, "media_height": h,
                "media_channels": channels, "media_bit_depth": bit_depth}

    @staticmethod
    def _jpeg(p: bytes):
        if len(p) < 4 or p[:2] != b"\xff\xd8":
            return None
        i, n = 2, len(p)
        while i + 4 <= n:
            if p[i] != 0xFF:
                return None
            marker = p[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # standalone
                i += 2
                continue
            seg_len = int.from_bytes(p[i + 2:i + 4], "big")
            if seg_len < 2:
                return None
            # SOF0-3, 5-7, 9-11, 13-15 all carry precision+dims
            if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                          0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                if i + 9 > n:
                    return None
                precision = p[i + 4]
                h = int.from_bytes(p[i + 5:i + 7], "big")
                w = int.from_bytes(p[i + 7:i + 9], "big")
                channels = p[i + 9] if i + 9 < n else None
                if not (w and h):
                    return None
                return {"media_format": "jpeg", "media_width": w,
                        "media_height": h, "media_channels": channels,
                        "media_bit_depth": precision}
            if marker == 0xDA:  # start of scan: dims should have appeared
                return None
            i += 2 + seg_len
        return None

    @staticmethod
    def _gif(p: bytes):
        if len(p) < 10 or p[:6] not in (b"GIF87a", b"GIF89a"):
            return None
        w = int.from_bytes(p[6:8], "little")
        h = int.from_bytes(p[8:10], "little")
        if not (w and h):
            return None
        return {"media_format": "gif", "media_width": w, "media_height": h}

    @staticmethod
    def _bmp(p: bytes):
        if len(p) < 26 or p[:2] != b"BM":
            return None
        w = int.from_bytes(p[18:22], "little", signed=True)
        h = int.from_bytes(p[22:26], "little", signed=True)
        if w <= 0 or h == 0:
            return None
        return {"media_format": "bmp", "media_width": w,
                "media_height": abs(h)}

    @staticmethod
    def _wav(p: bytes):
        if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
            return None
        i, n = 12, len(p)
        fields = None
        data_size = None
        while i + 8 <= n:
            cid = p[i:i + 4]
            csize = int.from_bytes(p[i + 4:i + 8], "little")
            if cid == b"fmt " and i + 8 + 16 <= n:
                channels = int.from_bytes(p[i + 10:i + 12], "little")
                rate = int.from_bytes(p[i + 12:i + 16], "little")
                byte_rate = int.from_bytes(p[i + 16:i + 20], "little")
                bits = int.from_bytes(p[i + 22:i + 24], "little")
                if channels and rate:
                    fields = {"media_format": "wav",
                              "media_channels": channels,
                              "media_sample_rate": rate,
                              "media_bit_depth": bits,
                              "_byte_rate": byte_rate}
            elif cid == b"data":
                data_size = min(csize, n - (i + 8))  # clamp to actual bytes
            i += 8 + csize + (csize % 2)  # chunks are word-aligned
        if fields is None:
            return None
        br = fields.pop("_byte_rate", 0)
        if data_size is not None and br:
            fields["media_duration_s"] = data_size / br
        return fields

    @staticmethod
    def _flac(p: bytes):
        """FLAC STREAMINFO (the mandatory first metadata block): fixed
        big-endian bit layout after the 4-byte block header — sample rate
        (20 bits), channels-1 (3), bits-per-sample-1 (5), total samples
        (36) packed into bytes 18..25."""
        if len(p) < 8 + 34 or p[:4] != b"fLaC":
            return None
        if (p[4] & 0x7F) != 0:          # first block must be STREAMINFO
            return None
        if int.from_bytes(p[5:8], "big") < 34:
            return None
        u = int.from_bytes(p[18:26], "big")
        sample_rate = u >> 44
        channels = ((u >> 41) & 0x7) + 1
        bits = ((u >> 36) & 0x1F) + 1
        total_samples = u & ((1 << 36) - 1)
        if not sample_rate:
            return None
        return {"media_format": "flac", "media_sample_rate": sample_rate,
                "media_channels": channels, "media_bit_depth": bits,
                "media_duration_s": total_samples / sample_rate}

    @staticmethod
    def _mp4(p: bytes):
        """ISO-BMFF (MP4/MOV) container: box walk for moov/mvhd (timescale,
        duration) and the first video trak's tkhd (16.16 fixed-point
        width/height). Detection requires a leading ftyp box."""
        if len(p) < 16 or p[4:8] != b"ftyp":
            return None
        fields = {"media_format": "mp4"}

        def boxes(start, end):
            i = start
            while i + 8 <= end:
                size = int.from_bytes(p[i:i + 4], "big")
                typ = p[i + 4:i + 8]
                hdr = 8
                if size == 1:  # 64-bit largesize
                    if i + 16 > end:
                        return
                    size = int.from_bytes(p[i + 8:i + 16], "big")
                    hdr = 16
                elif size == 0:  # box extends to end
                    size = end - i
                if size < hdr or i + size > end:
                    return
                yield typ, i + hdr, i + size
                i += size

        def walk(start, end):
            for typ, s, e in boxes(start, end):
                if typ in (b"moov", b"trak", b"mdia"):
                    walk(s, e)
                elif typ == b"mvhd" and e - s >= 20:
                    v = p[s]
                    if v == 1 and e - s >= 32:
                        ts = int.from_bytes(p[s + 20:s + 24], "big")
                        dur = int.from_bytes(p[s + 24:s + 32], "big")
                    else:
                        ts = int.from_bytes(p[s + 12:s + 16], "big")
                        dur = int.from_bytes(p[s + 16:s + 20], "big")
                    if ts:
                        fields["media_duration_s"] = dur / ts
                elif typ == b"tkhd":
                    v = p[s]
                    off = s + (88 if v == 1 else 76)
                    if off + 8 <= e:
                        w = int.from_bytes(p[off:off + 4], "big") >> 16
                        h = int.from_bytes(p[off + 4:off + 8], "big") >> 16
                        if w and h and "media_width" not in fields:
                            fields["media_width"] = w
                            fields["media_height"] = h

        walk(0, len(p))
        return fields

    @staticmethod
    def _mkv(p: bytes):
        """Matroska/WebM (EBML) container: variable-length-integer element
        walk through the EBML header (DocType) and Segment -> Info
        (TimestampScale, Duration) / Tracks -> TrackEntry (video
        PixelWidth/PixelHeight, audio SamplingFrequency/Channels)."""
        import struct
        if len(p) < 4 or p[:4] != b"\x1aE\xdf\xa3":
            return None

        def vint(i, keep_marker):
            if i >= len(p) or p[i] == 0:
                return None
            length = 8 - p[i].bit_length() + 1
            if i + length > len(p):
                return None
            val = int.from_bytes(p[i:i + length], "big")
            if not keep_marker:
                marker_stripped = val - (1 << (7 * length))
                unknown = marker_stripped == (1 << (7 * length)) - 1
                return marker_stripped, i + length, unknown
            return val, i + length, False

        def elements(start, end):
            i = start
            while i + 2 <= end:
                r = vint(i, keep_marker=True)
                if r is None:
                    return
                eid, j, _ = r
                r = vint(j, keep_marker=False)
                if r is None:
                    return
                size, k, unknown = r
                e = end if unknown else k + size
                if e > end or e < k:
                    return
                yield eid, k, e
                i = e

        def uint(s, e):
            return int.from_bytes(p[s:e], "big") if e > s else 0

        def flt(s, e):
            if e - s == 4:
                return struct.unpack(">f", p[s:e])[0]
            if e - s == 8:
                return struct.unpack(">d", p[s:e])[0]
            return None

        fields = {"media_format": "mkv"}
        timescale_ns, duration_units = 1_000_000, None
        for eid, s, e in elements(0, len(p)):
            if eid == 0x1A45DFA3:                       # EBML header
                for cid, cs, ce in elements(s, e):
                    if cid == 0x4282:                   # DocType
                        dt = p[cs:ce].decode("ascii", "replace")
                        if dt == "webm":
                            fields["media_format"] = "webm"
            elif eid == 0x18538067:                     # Segment
                for cid, cs, ce in elements(s, e):
                    if cid == 0x1549A966:               # Info
                        for gid, gs, ge in elements(cs, ce):
                            if gid == 0x2AD7B1:
                                timescale_ns = uint(gs, ge) or timescale_ns
                            elif gid == 0x4489:
                                duration_units = flt(gs, ge)
                    elif cid == 0x1654AE6B:             # Tracks
                        for tid, ts, te in elements(cs, ce):
                            if tid != 0xAE:             # TrackEntry
                                continue
                            for fid, fs, fe in elements(ts, te):
                                if fid == 0xE0:         # Video
                                    for vid_, vs, ve in elements(fs, fe):
                                        if vid_ == 0xB0 and \
                                                "media_width" not in fields:
                                            fields["media_width"] = \
                                                uint(vs, ve)
                                        elif vid_ == 0xBA and \
                                                "media_height" not in fields:
                                            fields["media_height"] = \
                                                uint(vs, ve)
                                elif fid == 0xE1:       # Audio
                                    for aid, as_, ae in elements(fs, fe):
                                        if aid == 0xB5 and \
                                                "media_sample_rate" not in \
                                                fields:
                                            sr = flt(as_, ae)
                                            if sr:
                                                fields["media_sample_rate"] \
                                                    = int(sr)
                                        elif aid == 0x9F and \
                                                "media_channels" not in \
                                                fields:
                                            fields["media_channels"] = \
                                                uint(as_, ae)
        if duration_units is not None:
            fields["media_duration_s"] = \
                duration_units * timescale_ns / 1e9
        return fields

    @staticmethod
    def _tiff(p: bytes):
        """TIFF: byte-order magic, IFD walk over 12-byte entries; SHORT
        and LONG single-count values read inline (both endians)."""
        if len(p) < 8:
            return None
        if p[:4] == b"II\x2a\x00":
            bo = "little"
        elif p[:4] == b"MM\x00\x2a":
            bo = "big"
        else:
            return None
        off = int.from_bytes(p[4:8], bo)
        if off + 2 > len(p):
            return None
        cnt = int.from_bytes(p[off:off + 2], bo)
        tags = {}
        for k in range(cnt):
            e = off + 2 + 12 * k
            if e + 12 > len(p):
                break
            tag = int.from_bytes(p[e:e + 2], bo)
            typ = int.from_bytes(p[e + 2:e + 4], bo)
            n = int.from_bytes(p[e + 4:e + 8], bo)
            if n != 1:
                continue                    # offset-valued arrays: skip
            if typ == 3:                    # SHORT packs into first 2 bytes
                tags[tag] = int.from_bytes(p[e + 8:e + 10], bo)
            elif typ == 4:                  # LONG
                tags[tag] = int.from_bytes(p[e + 8:e + 12], bo)
        w, h = tags.get(256), tags.get(257)
        if not w or not h:
            return None
        return {"media_format": "tiff", "media_width": w, "media_height": h,
                "media_channels": tags.get(277),
                "media_bit_depth": tags.get(258)}

    @staticmethod
    def _ogg(p: bytes):
        """Ogg container: first page ("OggS", version 0) -> first packet
        via the segment lacing table, then OpusHead (channels, pre-skip,
        input sample rate; Opus always decodes at 48 kHz) or the Vorbis
        identification header (channels, rate)."""
        if len(p) < 28 or p[:4] != b"OggS" or p[4] != 0:
            return None
        nseg = p[26]
        seg_table = p[27:27 + nseg]
        if len(seg_table) < nseg:
            return None
        body = 27 + nseg
        pkt_len = 0
        for s in seg_table:
            pkt_len += s
            if s < 255:
                break
        pkt = p[body:body + pkt_len]
        if pkt[:8] == b"OpusHead" and len(pkt) >= 14:
            return {"media_format": "ogg-opus",
                    "media_channels": pkt[9],
                    # field 10:12 is pre-skip; 12:16 the ORIGINAL input
                    # rate — report it; decode is always 48000
                    "media_sample_rate": int.from_bytes(pkt[12:16],
                                                        "little")}
        if pkt[:7] == b"\x01vorbis" and len(pkt) >= 16:
            return {"media_format": "ogg-vorbis",
                    "media_channels": pkt[11],
                    "media_sample_rate": int.from_bytes(pkt[12:16],
                                                        "little")}
        return None

    @staticmethod
    def _mp3(p: bytes):
        """MPEG-1 Layer III: skip an ID3v2 tag (synchsafe size) if present,
        then decode the 4-byte frame header (bitrate/sample-rate tables,
        channel mode); duration is the CBR estimate over the remaining
        bytes.  KEPT LAST in _PARSERS: the 11-bit frame sync is the
        loosest magic of the family."""
        i = 0
        if p[:3] == b"ID3" and len(p) >= 10:
            i = 10 + sum((p[6 + k] & 0x7F) << (7 * (3 - k)) for k in range(4))
        if len(p) < i + 4:
            return None
        b0, b1, b2, b3 = p[i:i + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            return None
        if (b1 >> 3) & 0x3 != 0x3 or (b1 >> 1) & 0x3 != 0x1:
            return None                     # MPEG-1 Layer III only
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        if br_idx in (0, 15) or sr_idx == 3:
            return None
        bitrate = _MP3_BITRATES[br_idx] * 1000
        mode = (b3 >> 6) & 0x3
        return {"media_format": "mp3",
                "media_sample_rate": _MP3_RATES[sr_idx],
                "media_channels": 1 if mode == 3 else 2,
                "media_duration_s": (len(p) - i) * 8 / bitrate}

    _PARSERS = (_png.__func__, _jpeg.__func__, _gif.__func__,
                _bmp.__func__, _wav.__func__, _flac.__func__,
                _mp4.__func__, _mkv.__func__, _tiff.__func__,
                _ogg.__func__, _mp3.__func__)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_column).to_pylist()
        cols: dict[str, list] = {k: [] for k in (
            "media_format", "media_width", "media_height", "media_channels",
            "media_sample_rate", "media_bit_depth", "media_duration_s",
            "header_ok")}
        for p in payloads:
            p = p or b""
            parsed = None
            for parser in self._PARSERS:
                parsed = parser(p)
                if parsed is not None:
                    break
            parsed = parsed or {}
            cols["header_ok"].append(bool(parsed))
            for k in ("media_format", "media_width", "media_height",
                      "media_channels", "media_sample_rate",
                      "media_bit_depth", "media_duration_s"):
                cols[k].append(parsed.get(k))
        for name, typ in (("media_format", pa.string()),
                          ("media_width", pa.int32()),
                          ("media_height", pa.int32()),
                          ("media_channels", pa.int32()),
                          ("media_sample_rate", pa.int32()),
                          ("media_bit_depth", pa.int32()),
                          ("media_duration_s", pa.float64()),
                          ("header_ok", pa.bool_())):
            batch = batch.append_column(name, pa.array(cols[name], type=typ))
        return batch


def probe_media_headers(ds: Dataset, payload_column: str = "payload",
                        batch_size: int = 256, concurrency=None) -> Dataset:
    """Actor-pool header-probe stage (real parsing, no codecs)."""
    from . import cached_stage, concurrency_kwargs
    return ds.map_batches(
        cached_stage(MediaHeaderProbe, payload_column=payload_column),
        batch_format="pyarrow", batch_size=batch_size,
        **concurrency_kwargs(concurrency))


class FrameSampler:
    """Video frame-sampling stub: emits (video_id, frame_index, frame_payload)
    rows — real decoding requires a codec library (absent); the deterministic
    fake slices the payload into pseudo-frames so downstream stages and the
    flat-map row-multiplication semantics are real."""

    def __init__(self, payload_column: str = "payload", id_column: str = "id",
                 frames_per_video: int = 4):
        self.payload_column = payload_column
        self.id_column = id_column
        self.frames_per_video = frames_per_video

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_pylist()
        payloads = batch.column(self.payload_column).to_pylist()
        out_id, out_idx, out_frame = [], [], []
        for vid, p in zip(ids, payloads):
            p = p or b""
            step = max(1, len(p) // self.frames_per_video)
            for fi in range(self.frames_per_video):
                out_id.append(vid)
                out_idx.append(fi)
                out_frame.append(p[fi * step:(fi + 1) * step])
        return pa.table({
            "video_id": out_id,
            "frame_index": pa.array(out_idx, type=pa.int32()),
            "frame_payload": pa.array(out_frame, type=pa.large_binary())})


# --------------------------------------------------------------------------
# Real dependency-free image kernel: 24-bit BMP codec + dHash perceptual
# fingerprint (image near-dup dedup without PIL — BMP rows are raw pixels).


def make_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed
    bottom-up BMP (BITMAPINFOHEADER) — the synth side of the image-dedup
    tests and the one raster format decodable without an image library."""
    import struct
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("make_bmp expects (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    stride = (w * 3 + 3) & ~3
    img_size = stride * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    # bottom-up rows, BGR byte order
    rows[:, :w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> "np.ndarray | None":
    """Decode a 24-bit uncompressed BMP into an (h, w, 3) uint8 RGB array.
    Supports bottom-up (positive height) and top-down rows; returns None
    for anything it can't parse (wrong magic, compressed, other depths) —
    the caller's null-propagation path, never an exception."""
    import struct
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h_raw = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        return None
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0 or w <= 0 or h_raw == 0:
        return None
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3
    if data_off + stride * h > len(payload):
        return None
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=data_off).reshape(h, stride)
    bgr = rows[:, :w * 3].reshape(h, w, 3)
    if h_raw > 0:  # bottom-up
        bgr = bgr[::-1]
    return np.ascontiguousarray(bgr[:, :, ::-1])


def dhash64(pixels: np.ndarray, grid: int = 8) -> int:
    """Difference-hash of an (h, w, 3) uint8 RGB image: integer luma
    (``(299r + 587g + 114b) // 1000``), box-average downsample to
    ``grid x (grid+1)`` with floor boundaries ``floor(i * dim / bins)``
    and EXACT integer means (sum // count), then bit (r, c) =
    ``right > left`` packed row-major, bit 0 = MSB.  All-integer, so
    bit-identical under any vectorization — the golden fixture recomputes
    it with per-pixel loops."""
    h, w = pixels.shape[:2]
    px = pixels.astype(np.int64)
    luma = (px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114) // 1000
    rb = (np.arange(grid + 1) * h) // grid
    cb = (np.arange(grid + 2) * w) // (grid + 1)
    cells = np.zeros((grid, grid + 1), dtype=np.int64)
    # two reduceat passes (sum over row bands, then column bands) + exact
    # integer division by the cell pixel count
    rowsum = np.add.reduceat(luma, rb[:-1], axis=0)
    cells = np.add.reduceat(rowsum, cb[:-1], axis=1)
    counts = np.outer(np.diff(rb), np.diff(cb))
    means = cells // counts
    bits = means[:, 1:] > means[:, :-1]
    out = 0
    for b in bits.ravel():
        out = (out << 1) | int(b)
    return out


class DHasher:
    """Actor stage: BMP payload -> 64-bit dHash (int64 bit pattern).
    Undecodable payloads yield null.  Pair with
    :func:`~malli_ray.stages.dedup.hamming_near_dups` for banded image
    near-dup pairs.  At 100 TB: payloads never shuffle — only (id, dhash)
    leaves this stage; size batch_size via :func:`suggested_batch_size`."""

    def __init__(self, payload_column: str = "payload",
                 id_column: str = "id", out: str = "dhash"):
        self.payload_column = payload_column
        self.id_column = id_column
        self.out = out

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_column).to_pylist()
        hashes = []
        for p in payloads:
            px = decode_bmp(p or b"")
            if px is None:
                hashes.append(None)
            else:
                v = dhash64(px)
                hashes.append(v - (1 << 64) if v >= (1 << 63) else v)
        return pa.table({
            self.id_column: batch.column(self.id_column),
            self.out: pa.array(hashes, type=pa.int64())})


def image_dhash(ds: Dataset, payload_column: str = "payload",
                id_column: str = "id", out: str = "dhash",
                concurrency=None, batch_size: "int | None" = None) -> Dataset:
    """Perceptual 64-bit dHash per image (24-bit BMP payloads decoded for
    real; other formats null).  See :class:`DHasher`."""
    from . import cached_stage, concurrency_kwargs
    kwargs = dict(concurrency_kwargs(concurrency))
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    return ds.map_batches(
        cached_stage(DHasher, payload_column=payload_column,
                     id_column=id_column, out=out),
        batch_format="pyarrow", **kwargs)


def synth_image_pixels(doc_id: int, h: int = 24, w: int = 32) -> np.ndarray:
    """Deterministic test image for doc_id (seeded default_rng).  Every
    doc_id divisible by 5 is its predecessor's image with ~25% of pixels
    perturbed by <= 12 gray levels — planted near-dup pairs whose dHash
    hamming distance is small (0-5ish) but usually nonzero."""
    base = doc_id - 1 if (doc_id % 5 == 0 and doc_id > 0) else doc_id
    rng = np.random.default_rng(int(base) & 0x7FFFFFFF)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if base != doc_id:
        prng = np.random.default_rng((int(doc_id) & 0x7FFFFFFF) + 10 ** 9)
        mask = prng.random((h, w)) < 0.25
        noise = prng.integers(-12, 13, size=(h, w, 3), dtype=np.int16)
        px = np.clip(px.astype(np.int16) + noise * mask[..., None],
                     0, 255).astype(np.uint8)
    return px


# --------------------------------------------------------------------------
# Real dependency-free audio kernel: WAV/PCM16 decode + integer
# energy-contour fingerprint (audio near-dup dedup without a codec).


def decode_wav_pcm16(payload: bytes) -> "np.ndarray | None":
    """Decode a RIFF/WAVE payload into an int16 mono PCM sample array by
    walking the chunk list (fmt must be PCM / 16-bit / 1 channel).
    Returns None for anything unparseable — the null-propagation path."""
    import struct
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt_ok, data = 12, False, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            tag, channels, _, _, _, bits = struct.unpack_from("<HHIIHH",
                                                              body, 0)
            fmt_ok = (tag == 1 and channels == 1 and bits == 16)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if not fmt_ok or data is None:
        return None
    return np.frombuffer(data[:len(data) - (len(data) % 2)], dtype="<i2")


def audio_fp64(pcm: np.ndarray, grid: int = 64) -> int:
    """Energy-contour fingerprint of an int16 PCM signal: split into
    ``grid + 1`` segments at floor boundaries ``i * n // (grid+1)``, exact
    integer mean energy per segment (sum of x^2 // count), bit i =
    ``energy[i+1] > energy[i]`` packed MSB-first.  All-integer — the
    audio sibling of :func:`dhash64`, robust to small additive noise but
    discriminative across unrelated signals."""
    n = len(pcm)
    if n < grid + 1:
        pcm = np.concatenate([pcm.astype(np.int64),
                              np.zeros(grid + 1 - n, dtype=np.int64)])
        n = grid + 1
    x = pcm.astype(np.int64)
    sq = x * x
    b = (np.arange(grid + 2) * n) // (grid + 1)
    sums = np.add.reduceat(sq, b[:-1])
    counts = np.diff(b)
    means = sums // counts
    out = 0
    for v in (means[1:] > means[:-1]):
        out = (out << 1) | int(v)
    return out


class AudioFingerprinter:
    """Actor stage: WAV payload -> 64-bit energy-contour fingerprint
    (int64 bit pattern; null when undecodable).  Pair with
    :func:`~malli_ray.stages.dedup.hamming_near_dups` — payloads never
    shuffle, only (id, fingerprint) leaves this stage."""

    def __init__(self, payload_column: str = "payload",
                 id_column: str = "id", out: str = "audio_fp"):
        self.payload_column = payload_column
        self.id_column = id_column
        self.out = out

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_column).to_pylist()
        fps = []
        for p in payloads:
            pcm = decode_wav_pcm16(p or b"")
            if pcm is None:
                fps.append(None)
            else:
                v = audio_fp64(pcm)
                fps.append(v - (1 << 64) if v >= (1 << 63) else v)
        return pa.table({
            self.id_column: batch.column(self.id_column),
            self.out: pa.array(fps, type=pa.int64())})


def audio_fingerprint(ds: Dataset, payload_column: str = "payload",
                      id_column: str = "id", out: str = "audio_fp",
                      concurrency=None) -> Dataset:
    """64-bit energy-contour fingerprint per WAV payload (real PCM16
    decode).  See :class:`AudioFingerprinter`."""
    from . import cached_stage, concurrency_kwargs
    return ds.map_batches(
        cached_stage(AudioFingerprinter, payload_column=payload_column,
                     id_column=id_column, out=out),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


def synth_audio_pcm(doc_id: int, n_samples: int = 2048) -> np.ndarray:
    """Deterministic test signal for doc_id (seeded default_rng int16
    noise).  Every doc_id divisible by 4 is its predecessor's signal with
    ~10% of samples nudged by <= 400 — planted near-dup pairs with small
    but usually nonzero fingerprint hamming distance."""
    base = doc_id - 1 if (doc_id % 4 == 0 and doc_id > 0) else doc_id
    rng = np.random.default_rng((int(base) & 0x7FFFFFFF) ^ 0x5EED)
    pcm = rng.integers(-30000, 30001, size=n_samples).astype(np.int16)
    if base != doc_id:
        prng = np.random.default_rng(
            ((int(doc_id) & 0x7FFFFFFF) ^ 0x5EED) + 2 * 10 ** 9)
        mask = prng.random(n_samples) < 0.10
        noise = prng.integers(-400, 401, size=n_samples).astype(np.int32)
        pcm = np.clip(pcm.astype(np.int32) + noise * mask,
                      -32768, 32767).astype(np.int16)
    return pcm


# --------------------------------------------------------------------------
# JPEG EXIF metadata: APP1/TIFF IFD parse (orientation, capture datetime)
# plus SOF dimensions — the metadata-extraction step of an image-corpus
# pipeline (dedup by capture time, rotate-normalize by orientation),
# dependency-free like the rest of MediaHeaderProbe.


def make_jpeg_exif(width: int, height: int, orientation: int,
                   datetime_str: str) -> bytes:
    """Minimal valid JPEG with an EXIF APP1 segment: SOI + APP1 (TIFF IFD0
    with Orientation 0x0112 SHORT and DateTime 0x0132 ASCII) + SOF0 + EOI.
    ``datetime_str`` follows the EXIF "YYYY:MM:DD HH:MM:SS" layout (19
    chars; stored NUL-terminated per spec)."""
    dt = datetime_str.encode("ascii") + b"\x00"

    def u16(v: int) -> bytes:
        return v.to_bytes(2, "little")

    def u32(v: int) -> bytes:
        return v.to_bytes(4, "little")

    # TIFF body (little-endian), offsets relative to its first byte
    # layout: header(8) + ifd(2 + 2*12 + 4 = 30) + datetime payload
    dt_off = 8 + 2 + 2 * 12 + 4
    ifd = (u16(2)
           + u16(0x0112) + u16(3) + u32(1) + u16(orientation) + u16(0)
           + u16(0x0132) + u16(2) + u32(len(dt)) + u32(dt_off)
           + u32(0))
    tiff = b"II\x2a\x00" + u32(8) + ifd + dt
    app1_body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + (len(app1_body) + 2).to_bytes(2, "big") + app1_body
    sof = (b"\xff\xc0" + (11).to_bytes(2, "big") + bytes([8])
           + height.to_bytes(2, "big") + width.to_bytes(2, "big")
           + bytes([1, 1, 0x11, 0]))
    return b"\xff\xd8" + app1 + sof + b"\xff\xd9"


def parse_jpeg_exif(p: bytes):
    """Parse a JPEG's SOF dimensions and EXIF APP1 Orientation/DateTime.
    Returns ``{"jpeg_width", "jpeg_height", "exif_orientation",
    "exif_datetime"}`` (missing EXIF fields null) or None when the payload
    is not a JPEG / carries no SOF marker.  The TIFF IFD walk mirrors
    MediaHeaderProbe._tiff (both byte orders, SHORT/LONG inline values)
    plus offset-valued ASCII entries for DateTime."""
    if len(p) < 4 or p[:2] != b"\xff\xd8":
        return None
    out = {"jpeg_width": None, "jpeg_height": None,
           "exif_orientation": None, "exif_datetime": None}
    i, n = 2, len(p)
    while i + 4 <= n:
        if p[i] != 0xFF:
            return None
        marker = p[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seg_len = int.from_bytes(p[i + 2:i + 4], "big")
        if seg_len < 2:
            return None
        if marker == 0xE1 and p[i + 4:i + 10] == b"Exif\x00\x00":
            base = i + 10
            t = p[base:i + 2 + seg_len]
            bo = None
            if t[:4] == b"II\x2a\x00":
                bo = "little"
            elif t[:4] == b"MM\x00\x2a":
                bo = "big"
            if bo is not None and len(t) >= 8:
                off = int.from_bytes(t[4:8], bo)
                if off + 2 <= len(t):
                    cnt = int.from_bytes(t[off:off + 2], bo)
                    for k in range(cnt):
                        e = off + 2 + 12 * k
                        if e + 12 > len(t):
                            break
                        tag = int.from_bytes(t[e:e + 2], bo)
                        typ = int.from_bytes(t[e + 2:e + 4], bo)
                        cnt_v = int.from_bytes(t[e + 4:e + 8], bo)
                        if tag == 0x0112 and typ == 3 and cnt_v == 1:
                            out["exif_orientation"] = int.from_bytes(
                                t[e + 8:e + 10], bo)
                        elif tag == 0x0132 and typ == 2 and cnt_v > 0:
                            if cnt_v <= 4:
                                raw = t[e + 8:e + 8 + cnt_v]
                            else:
                                v_off = int.from_bytes(t[e + 8:e + 12], bo)
                                raw = t[v_off:v_off + cnt_v]
                            out["exif_datetime"] = (
                                raw.split(b"\x00", 1)[0]
                                .decode("ascii", "replace"))
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            if i + 9 > n:
                return None
            out["jpeg_height"] = int.from_bytes(p[i + 5:i + 7], "big")
            out["jpeg_width"] = int.from_bytes(p[i + 7:i + 9], "big")
        elif marker == 0xDA:
            break
        i += 2 + seg_len
    if out["jpeg_width"] is None:
        return None
    return out


class ExifProbe:
    """Actor stage: append ``jpeg_width/jpeg_height/exif_orientation``
    (int32 | null), ``exif_datetime`` (string | null) and ``exif_ok``
    (bool) parsed from a JPEG payload column.  Per-payload work is a few
    dozen byte reads — O(rows), same cost model as MediaHeaderProbe."""

    def __init__(self, payload_column: str = "payload"):
        self.payload_column = payload_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_column).to_pylist()
        cols = {"jpeg_width": [], "jpeg_height": [],
                "exif_orientation": [], "exif_datetime": [], "exif_ok": []}
        for p in payloads:
            parsed = parse_jpeg_exif(p or b"") or {}
            cols["exif_ok"].append(bool(parsed))
            for k in ("jpeg_width", "jpeg_height", "exif_orientation",
                      "exif_datetime"):
                cols[k].append(parsed.get(k))
        for name, typ in (("jpeg_width", pa.int32()),
                          ("jpeg_height", pa.int32()),
                          ("exif_orientation", pa.int32()),
                          ("exif_datetime", pa.string()),
                          ("exif_ok", pa.bool_())):
            batch = batch.append_column(name, pa.array(cols[name], type=typ))
        return batch


def probe_exif(ds: Dataset, payload_column: str = "payload",
               batch_size: int = 256, concurrency=None) -> Dataset:
    """Actor-pool EXIF-probe stage (real parsing, no codecs)."""
    from . import cached_stage, concurrency_kwargs
    return ds.map_batches(
        cached_stage(ExifProbe, payload_column=payload_column),
        batch_format="pyarrow", batch_size=batch_size,
        **concurrency_kwargs(concurrency))


class ImagePatcher:
    """Actor stage: BMP payload -> ViT-style patch features over the REAL
    raster codec.  Each decoded image's integer luma grid is split into
    ``grid x grid`` cells with floor boundaries ``i*dim//grid`` (the
    dhash64 segmentation) and every cell emits one row: ``(id, patch_row,
    patch_col, luma_sum, n_px, luma_mean)`` — sums and counts are exact
    int64 and the mean is the exact integer division, so the stage is
    bit-identical under any vectorization (golden-fixture checkable).
    Undecodable payloads emit no rows.  Flat-map row multiplication
    (grid^2 rows per image) — the same shape a real patch-embedding
    pipeline feeds to a vision tower."""

    def __init__(self, payload_column: str = "payload",
                 id_column: str = "id", grid: int = 4):
        self.payload_column = payload_column
        self.id_column = id_column
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.grid
        ids = batch.column(self.id_column).to_pylist()
        payloads = batch.column(self.payload_column).to_pylist()
        out_id, out_r, out_c, out_sum, out_n = [], [], [], [], []
        for rid, p in zip(ids, payloads):
            px = decode_bmp(p or b"")
            if px is None:
                continue
            h, w = px.shape[:2]
            if h < g or w < g:
                continue
            lx = px.astype(np.int64)
            luma = (lx[:, :, 0] * 299 + lx[:, :, 1] * 587
                    + lx[:, :, 2] * 114) // 1000
            rb = (np.arange(g + 1) * h) // g
            cb = (np.arange(g + 1) * w) // g
            rowsum = np.add.reduceat(luma, rb[:-1], axis=0)
            cells = np.add.reduceat(rowsum, cb[:-1], axis=1)
            counts = np.outer(np.diff(rb), np.diff(cb))
            rr, cc = np.meshgrid(np.arange(g), np.arange(g),
                                 indexing="ij")
            out_id.extend([rid] * (g * g))
            out_r.append(rr.ravel())
            out_c.append(cc.ravel())
            out_sum.append(cells.ravel())
            out_n.append(counts.ravel())
        if not out_id:
            return pa.table({
                self.id_column: pa.array(
                    [], type=batch.schema.field(self.id_column).type),
                "patch_row": pa.array([], type=pa.int64()),
                "patch_col": pa.array([], type=pa.int64()),
                "luma_sum": pa.array([], type=pa.int64()),
                "n_px": pa.array([], type=pa.int64()),
                "luma_mean": pa.array([], type=pa.int64())})
        sums = np.concatenate(out_sum)
        ns = np.concatenate(out_n)
        return pa.table({
            self.id_column: out_id,
            "patch_row": pa.array(np.concatenate(out_r).astype(np.int64)),
            "patch_col": pa.array(np.concatenate(out_c).astype(np.int64)),
            "luma_sum": pa.array(sums.astype(np.int64)),
            "n_px": pa.array(ns.astype(np.int64)),
            "luma_mean": pa.array((sums // ns).astype(np.int64))})


def image_patch_features(ds: Dataset, payload_column: str = "payload",
                         id_column: str = "id", grid: int = 4,
                         batch_size: int = 64, concurrency=None) -> Dataset:
    """Actor-pool patch-featurization stage over the dependency-free BMP
    codec (see ImagePatcher)."""
    from . import cached_stage, concurrency_kwargs
    return ds.map_batches(
        cached_stage(ImagePatcher, payload_column=payload_column,
                     id_column=id_column, grid=grid),
        batch_format="pyarrow", batch_size=batch_size,
        **concurrency_kwargs(concurrency))
