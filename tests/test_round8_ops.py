"""Round-8 operator tests: real PNG codec (zlib inflate + scanline
unfilter), dual-precision wei CSV projection, and streaming
restart-recovery (state carried across a full stop/start on the same
checkpoint).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from ethereum_export_pipeline_spark.operators.multimodal import (
    PNG_SIG, decode_image, decode_png, encode_png)

SF = "/root/testdata/sf0.001"


# ----------------------------------------------------------- png codec

def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def _png(w, h, depth, ctype, interlace, filtered: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(filtered))
            + _chunk(b"IEND", b""))


def test_png_roundtrip_every_filter_and_shape():
    rng = np.random.RandomState(7)
    for shape in [(7, 9, 3), (1, 1, 3), (13, 8, 1), (4, 31, 3)]:
        px = rng.randint(0, 256, size=shape).astype(np.uint8)
        for ft in [None, 0, 1, 2, 3, 4]:
            filters = None if ft is None else [ft] * shape[0]
            w, h, c, back = decode_png(encode_png(px, filters=filters))
            assert (h, w, c) == shape
            assert np.array_equal(back, px), (shape, ft)


def test_png_dispatches_through_decode_image():
    px = np.arange(5 * 6 * 3, dtype=np.uint8).reshape(5, 6, 3)
    w, h, c, back = decode_image(encode_png(px))
    assert (w, h, c) == (6, 5, 3)
    assert np.array_equal(back, px)


def test_png_paeth_and_average_hand_vectors():
    # Paeth, gray 2x2, pixels [[10,20],[30,50]] — filtered bytes
    # hand-derived from the spec's predictor + tie-break order
    filtered = bytes([4, 10, 10, 4, 20, 20])
    _, _, _, dec = decode_png(_png(2, 2, 8, 0, 0, filtered))
    assert dec.ravel().tolist() == [10, 20, 30, 50]
    # Average, gray 1x3, pixels [100,101,103]: preds 0, 50, 50
    _, _, _, dec = decode_png(_png(3, 1, 8, 0, 0, bytes([3, 100, 51, 53])))
    assert dec.ravel().tolist() == [100, 101, 103]


def test_png_rejects_malformed_never_raises():
    enc = encode_png(np.zeros((3, 4, 3), np.uint8))
    assert decode_png(None) is None
    assert decode_png(b"junk") is None
    assert decode_png(enc[:-5]) is None          # truncated (no IEND)
    assert decode_png(enc[:20]) is None          # truncated mid-IHDR
    bad = bytearray(enc)
    bad[40] ^= 1                                  # flip an IDAT byte
    assert decode_png(bytes(bad)) is None         # CRC catches it
    stream = zlib.compress(bytes(13))
    assert decode_png(_png(4, 3, 8, 2, 1, bytes(39))) is None  # Adam7
    assert decode_png(_png(4, 3, 16, 2, 0, bytes(75))) is None  # 16-bit
    assert decode_png(_png(4, 3, 8, 6, 0, bytes(51))) is None  # RGBA
    assert decode_png(_png(2, 1, 8, 0, 0, bytes([9, 0, 0]))) is None  # bad ft
    # inflated length != h*(1+stride)
    assert decode_png(_png(4, 3, 8, 0, 0, bytes(14))) is None
    # zlib garbage in IDAT
    raw = (PNG_SIG
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
           + _chunk(b"IDAT", b"\xff\xfe\x00") + _chunk(b"IEND", b""))
    assert decode_png(raw) is None
    assert stream  # silence lint


# ------------------------------------- hierarchy aggregates (no closure)

def test_hierarchy_aggregates_matches_python_reference(spark):
    """Deep chain (depth 19 — past the old rounds=3 closure reach),
    a bushy star, and isolated roots: depth / n_desc / desc_sum must
    equal a brute-force python walk."""
    from ethereum_export_pipeline_spark.operators.graph import (
        hierarchy_aggregates)
    # chain 1<-2<-...<-20 ; star 100<-{101..105} ; 200 isolated
    parent = {i: i - 1 for i in range(2, 21)}
    parent.update({i: 100 for i in range(101, 106)})
    nodes = list(range(1, 21)) + [100, 101, 102, 103, 104, 105, 200]
    val = {n: n * 7 for n in nodes}

    def anc(n):
        out = []
        while n in parent:
            n = parent[n]
            out.append(n)
        return out

    exp = {}
    for n in nodes:
        desc = [m for m in nodes if n in anc(m)]
        exp[n] = (len(anc(n)), len(desc), sum(val[m] for m in desc))

    edges = spark.createDataFrame(
        [(c, p) for c, p in parent.items()], "child long, parent long")
    vals = spark.createDataFrame(
        [(n, val[n]) for n in nodes], "node long, val long")
    got = {r["node"]: (r["depth"], r["n_desc"], r["desc_sum"])
           for r in hierarchy_aggregates(edges, vals, rounds=5).collect()}
    assert got == exp


# ------------------------------------------- stream restart recovery

def test_cusum_state_survives_restart_on_same_checkpoint(spark, tmp_path):
    """State must carry across a FULL stop/start: run half the input
    to completion, start a NEW query (fresh isolated session) on the
    SAME checkpoint, feed the rest — alarms whose accumulation spans
    the restart fire with s values only reachable via recovered
    state, and phase-1 alarms are NOT re-emitted (committed source
    offsets are honored, no reprocessing)."""
    from ethereum_export_pipeline_spark.streaming.sessions import (
        CUSUM_H, CUSUM_K0, run_cusum_checkpointed)
    events_dir = tmp_path / "events_in"
    ckpt = str(tmp_path / "ckpt")
    events_dir.mkdir()

    def land(name, rows):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq
        pdf = pd.DataFrame(rows, columns=[
            "event_id", "ts", "user_id", "event_type", "value", "props"])
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            str(events_dir / name), coerce_timestamps="us")

    # user 7: three 150.00s -> s = 9000, 18000, 27000 => ALARM(27000),
    # reset; then one 150.00 -> s carried into the restart = 9000.
    # user 8: three 120.00s -> s = 18000 carried, no alarm yet.
    land("part1.parquet", [
        (1, 100, 7, "a", 150.0, ""), (2, 101, 7, "a", 150.0, ""),
        (3, 102, 7, "a", 150.0, ""), (4, 103, 7, "a", 150.0, ""),
        (5, 100, 8, "a", 120.0, ""), (6, 101, 8, "a", 120.0, ""),
        (7, 102, 8, "a", 120.0, ""),
    ])
    first = run_cusum_checkpointed(spark, str(events_dir), ckpt)
    assert [(r.user_id, r.event_id, r.s_cents) for r in first] == \
        [(7, 3, 27_000)]

    # restart: user 7 needs carried s=9000 to alarm (9000+18000-6000 =
    # 21000 > H; from scratch 12000 stays under); user 8 needs carried
    # s=18000 (18000+8100-6000 = 20100 > H; from scratch 2100).
    land("part2.parquet", [
        (8, 104, 7, "a", 180.0, ""),
        (9, 103, 8, "a", 81.0, ""),
    ])
    second = run_cusum_checkpointed(spark, str(events_dir), ckpt)
    got = sorted((r.user_id, r.event_id, r.s_cents) for r in second)
    assert got == [(7, 8, 21_000), (8, 9, 20_100)], got
    assert CUSUM_K0 == 6_000 and CUSUM_H == 20_000  # values above assume


def test_png_media_fixture_matches_ppm_pixels(spark):
    """decode(png fixture) must equal decode(ppm fixture) pixel for
    pixel — the two queries differ by codec only."""
    from ethereum_export_pipeline_spark.operators.multimodal import (
        documents_as_png_media, documents_as_ppm_media, extract_features)
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
                 .orderBy("doc_id").limit(40))
    a = {r["media_id"]: r for r in
         extract_features(documents_as_png_media(docs)).collect()}
    b = {r["media_id"]: r for r in
         extract_features(documents_as_ppm_media(docs)).collect()}
    assert set(a) == set(b) and a
    for mid, ra in a.items():
        rb = b[mid]
        for k in ("width", "height", "channels", "ch_sum", "px_hist"):
            assert ra[k] == rb[k], (mid, k)
        if ra["width"] is not None:
            # the compressed payload must actually be smaller-or-equal
            # plus constant chunk overhead on these tiled planes —
            # mainly: it must NOT be the raw plane
            assert ra["n_bytes"] != rb["n_bytes"]
