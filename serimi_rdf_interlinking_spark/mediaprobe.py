"""Container-metadata probe: format detection + header-level metadata
WITHOUT decoding payload pixels/samples.

This is the cheap pass of a large-scale media pipeline: at 100 TB you
probe every payload's first few KB to route/filter/partition (format,
dimensions, duration) and only run the expensive decode stage on the
survivors. Every probe here reads only container headers — magic
bytes, PNG IHDR, GIF screen descriptor + block walk, JPEG marker walk
to SOF, WAV fmt/data chunks, ISO-BMFF (MP4) box walk to mvhd/tkhd —
so per-row cost is microseconds regardless of payload size, and the
operator is a single mapInPandas stage: partition-parallel, no
shuffle, fixed-width output.

The MP4 path parses the public ISO/IEC 14496-12 box grammar
([size][fourcc] framing, version-0/1 mvhd and tkhd) for metadata
only; sample DECODE still requires codec libraries absent here and
stays NotImplementedError in the decode stage — probing is exactly
the part that does not need them.

Detection is payload-sniffed (magic bytes), deliberately ignoring the
table's mime column: at web scale the declared mime is routinely
wrong, and the probe is how you find out.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROBE_SCHEMA = (
    "media_id string, container string, variant string, width int,"
    " height int, n_frames int, duration_ms long, sample_rate int,"
    " channels int, bit_depth int"
)

_EMPTY = {
    "container": "unknown", "variant": None, "width": None,
    "height": None, "n_frames": None, "duration_ms": None,
    "sample_rate": None, "channels": None, "bit_depth": None,
}


def _probe_png(p: bytes) -> dict:
    # IHDR is always the first chunk: length(4) 'IHDR' w h depth ctype
    w = int.from_bytes(p[16:20], "big")
    h = int.from_bytes(p[20:24], "big")
    depth, ctype, _comp, _filt, interlace = p[24:29]
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    return {
        **_EMPTY, "container": "png",
        "variant": "interlaced" if interlace else "static",
        "width": w, "height": h, "n_frames": 1,
        "bit_depth": depth, "channels": nch,
    }


def _probe_gif(p: bytes) -> dict:
    w = int.from_bytes(p[6:8], "little")
    h = int.from_bytes(p[8:10], "little")
    packed = p[10]
    pos = 13
    if packed & 0x80:
        pos += (2 << (packed & 0x07)) * 3
    n_frames = 0
    total_cs = 0
    delay_cs = 0
    while pos < len(p):
        block = p[pos]
        if block == 0x21:
            label = p[pos + 1]
            pos += 2
            first = True
            while p[pos] != 0:
                ln = p[pos]
                if label == 0xF9 and first:
                    delay_cs = int.from_bytes(
                        p[pos + 2 : pos + 4], "little"
                    )
                    first = False
                pos += 1 + ln
            pos += 1
        elif block == 0x2C:
            n_frames += 1
            total_cs += delay_cs
            delay_cs = 0
            ipacked = p[pos + 9]
            pos += 10
            if ipacked & 0x80:
                pos += (2 << (ipacked & 0x07)) * 3
            pos += 1  # LZW min code
            while p[pos] != 0:
                pos += 1 + p[pos]
            pos += 1
        elif block == 0x3B:
            break
        else:
            break  # malformed tail: report what was walked so far
    return {
        **_EMPTY, "container": "gif",
        "variant": "animated" if n_frames > 1 else "static",
        "width": w, "height": h, "n_frames": max(n_frames, 1),
        "duration_ms": total_cs * 10 if n_frames > 1 else None,
        "bit_depth": 8, "channels": 3,
    }


def _probe_jpeg(p: bytes) -> dict:
    pos = 2
    while pos + 3 < len(p):
        if p[pos] != 0xFF:
            break
        while pos + 1 < len(p) and p[pos + 1] == 0xFF:
            pos += 1  # fill bytes
        marker = p[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        length = int.from_bytes(p[pos : pos + 2], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            depth = p[pos + 2]
            h = int.from_bytes(p[pos + 3 : pos + 5], "big")
            w = int.from_bytes(p[pos + 5 : pos + 7], "big")
            ncomp = p[pos + 7]
            variant = {
                0xC0: "baseline", 0xC1: "extended", 0xC2: "progressive",
            }.get(marker, f"sof{marker - 0xC0}")
            return {
                **_EMPTY, "container": "jpeg", "variant": variant,
                "width": w, "height": h, "n_frames": 1,
                "bit_depth": depth, "channels": ncomp,
            }
        if marker == 0xDA:
            break  # SOS before SOF: malformed
        pos += length
    return {**_EMPTY, "container": "jpeg", "variant": "truncated"}


def _probe_wav(p: bytes) -> dict:
    pos = 12
    out = {**_EMPTY, "container": "wav", "variant": "pcm"}
    data_len = None
    while pos + 8 <= len(p):
        cid = p[pos : pos + 4]
        ln = int.from_bytes(p[pos + 4 : pos + 8], "little")
        if cid == b"fmt ":
            body = p[pos + 8 : pos + 8 + ln]
            fmt = int.from_bytes(body[0:2], "little")
            out["variant"] = {1: "pcm", 3: "ieee_float"}.get(
                fmt, f"fmt{fmt}"
            )
            out["channels"] = int.from_bytes(body[2:4], "little")
            out["sample_rate"] = int.from_bytes(body[4:8], "little")
            out["bit_depth"] = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data_len = ln
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if (
        data_len is not None
        and out["sample_rate"]
        and out["channels"]
        and out["bit_depth"]
    ):
        bytes_per_s = (
            out["sample_rate"] * out["channels"] * out["bit_depth"] // 8
        )
        out["duration_ms"] = data_len * 1000 // bytes_per_s
    return out


def _probe_ppm(p: bytes) -> dict:
    toks: list[bytes] = []
    i = 0
    while len(toks) < 4 and i < len(p):
        while i < len(p) and p[i : i + 1].isspace():
            i += 1
        if p[i : i + 1] == b"#":
            while i < len(p) and p[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(p) and not p[j : j + 1].isspace():
            j += 1
        toks.append(p[i:j])
        i = j
    maxval = int(toks[3])
    return {
        **_EMPTY, "container": "ppm", "variant": "p6",
        "width": int(toks[1]), "height": int(toks[2]), "n_frames": 1,
        "bit_depth": 16 if maxval > 255 else 8, "channels": 3,
    }


def _walk_boxes(p: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for ISO-BMFF boxes in
    [pos, end): 32-bit size, size==1 -> 64-bit largesize, size==0 ->
    box extends to the end (14496-12 §4.2)."""
    while pos + 8 <= end:
        size = int.from_bytes(p[pos : pos + 4], "big")
        fourcc = p[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            size = int.from_bytes(p[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            break
        yield fourcc, body, pos + size
        pos += size


def _probe_mp4(p: bytes) -> dict:
    out = {**_EMPTY, "container": "mp4"}
    for fourcc, b0, b1 in _walk_boxes(p, 0, len(p)):
        if fourcc == b"ftyp":
            out["variant"] = p[b0 : b0 + 4].decode("ascii", "replace")
        elif fourcc == b"moov":
            for f2, c0, c1 in _walk_boxes(p, b0, b1):
                if f2 == b"mvhd":
                    ver = p[c0]
                    if ver == 1:
                        ts = int.from_bytes(p[c0 + 20 : c0 + 24], "big")
                        dur = int.from_bytes(p[c0 + 24 : c0 + 32], "big")
                    else:
                        ts = int.from_bytes(p[c0 + 12 : c0 + 16], "big")
                        dur = int.from_bytes(p[c0 + 16 : c0 + 20], "big")
                    if ts:
                        out["duration_ms"] = dur * 1000 // ts
                elif f2 == b"trak":
                    for f3, d0, d1 in _walk_boxes(p, c0, c1):
                        if f3 != b"tkhd":
                            continue
                        ver = p[d0]
                        # verflags(4) + times(8|16) + track_id(4) +
                        # reserved(4) + duration(4|8) = 24|36, then
                        # reserved/layer/group/volume/matrix = 52
                        off = d0 + (24 if ver == 0 else 36) + 52
                        w = int.from_bytes(p[off : off + 4], "big")
                        h = int.from_bytes(p[off + 4 : off + 8], "big")
                        if w and h:  # 16.16 fixed point
                            out["width"] = w >> 16
                            out["height"] = h >> 16
    return out


def probe_payload(p: bytes) -> dict:
    """Sniff magic bytes and parse container headers. Never raises on
    content — unknown/corrupt payloads come back container='unknown'
    so one bad blob can't kill a 10^12-row probe stage."""
    try:
        if p[:8] == b"\x89PNG\r\n\x1a\n":
            return _probe_png(p)
        if p[:6] in (b"GIF87a", b"GIF89a"):
            return _probe_gif(p)
        if p[:2] == b"\xff\xd8":
            return _probe_jpeg(p)
        if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            return _probe_wav(p)
        if p[:2] == b"P6":
            return _probe_ppm(p)
        if len(p) >= 8 and p[4:8] == b"ftyp":
            return _probe_mp4(p)
        return dict(_EMPTY)
    except Exception:
        return {**_EMPTY, "container": "corrupt"}


def probe_media(media: DataFrame) -> DataFrame:
    """Header-only metadata probe over a media table (see module
    docstring). One mapInPandas stage; output is one fixed-width row
    per input row."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            probes = [
                probe_payload(bytes(p)) if p is not None else dict(_EMPTY)
                for p in pdf["payload"]
            ]
            out = pd.DataFrame(probes)
            out.insert(0, "media_id", pdf["media_id"].values)
            # nullable ints must stay object/float-free for Arrow
            for c in ("width", "height", "n_frames", "sample_rate",
                      "channels", "bit_depth"):
                out[c] = out[c].astype("Int32")
            out["duration_ms"] = out["duration_ms"].astype("Int64")
            yield out

    return media.select("media_id", "payload").mapInPandas(
        _run, PROBE_SCHEMA
    )


def synth_mp4(
    w: int, h: int, duration_ms: int, timescale: int = 1000,
    brand: bytes = b"isom", version: int = 0,
) -> bytes:
    """Deterministic minimal ISO-BMFF container: ftyp + moov(mvhd +
    trak(tkhd)) + empty mdat — real 14496-12 box framing for the
    probe path; carries no codec samples (sample decode is honestly
    out of scope without codec libraries)."""

    def box(fourcc: bytes, body: bytes) -> bytes:
        return (8 + len(body)).to_bytes(4, "big") + fourcc + body

    dur_units = duration_ms * timescale // 1000
    if version == 1:
        mvhd = box(
            b"mvhd",
            bytes([1, 0, 0, 0]) + b"\x00" * 16
            + timescale.to_bytes(4, "big") + dur_units.to_bytes(8, "big")
            + b"\x00" * 80,
        )
        tk_pre = bytes([1, 0, 0, 0]) + b"\x00" * 16 + b"\x00\x00\x00\x01" \
            + b"\x00" * 4 + dur_units.to_bytes(8, "big")
    else:
        mvhd = box(
            b"mvhd",
            bytes([0, 0, 0, 0]) + b"\x00" * 8
            + timescale.to_bytes(4, "big") + dur_units.to_bytes(4, "big")
            + b"\x00" * 80,
        )
        tk_pre = bytes([0, 0, 0, 0]) + b"\x00" * 8 + b"\x00\x00\x00\x01" \
            + b"\x00" * 4 + dur_units.to_bytes(4, "big")
    tkhd = box(
        b"tkhd",
        tk_pre + b"\x00" * 52
        + (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big"),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return (
        box(b"ftyp", brand + (0).to_bytes(4, "big") + brand)
        + moov
        + box(b"mdat", b"")
    )
