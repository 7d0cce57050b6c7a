"""Round-11 codec shelf — more REAL media-format parsing under the
oracle gate, extending the round-9 PNG and round-11 JPEG closes:

* G.711 µ-law + A-law telephony decode (ITU-T G.711 shift-add
  expansion) — pure JVM arithmetic, zero Python, zero shuffle;
* IMA/DVI ADPCM decode — a genuinely STATEFUL compressed-audio codec,
  decoded for real per document (mapInPandas) and oracle-paired
  against a DuckDB RECURSIVE-CTE replica of the step/index automaton;
* MPEG-1 Layer III (MP3) frame-header parse — the zero-decode
  container pass (sync word, spec bitrate/samplerate tables, frame
  length), the same shape as the round-10 PNG header parser;
* GIF89a logical-screen-descriptor parse (little-endian u16s, packed
  global-color-table bits);
* uncompressed 24-bit BMP decode — real header parse, 4-byte row
  stride, bottom-up flip and BGR→RGB, gated by a row-weighted checksum
  the oracle recomputes positionally.

Reference parity note: the reference engine (wizgrao/blow,
maps/maps.go:8-21) moves opaque []byte records and has no binary,
media, or codec vocabulary; this shelf is the brief's multimodal
mandate (decode / feature-extract behind typed binary columns).

Scale design: every query is map-only over the documents table — the
G.711/MP3/GIF parses are whole-stage-codegen JVM expressions (no
Python at all), and the ADPCM/BMP decodes are Arrow-batched
mapInPandas with per-batch (never per-row) overhead. Nothing here
shuffles document bodies; output rows are one per document.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blow_spark import multimodal
from blow_spark.queries import register
from blow_spark.sources import read_table


def _duck_byte(hx: str, k: str) -> str:
    """DuckDB snippet: 0-based byte ``k`` of the hex string ``hx`` —
    the shared positional-extraction idiom of the multimodal oracles."""
    return (
        f"((strpos('0123456789ABCDEF', substring({hx}, CAST(2*({k})+1 AS INT), 1)) - 1) * 16"
        f" + (strpos('0123456789ABCDEF', substring({hx}, CAST(2*({k})+2 AS INT), 1)) - 1))"
    )


# --------------------------------------------------------------------------
# G.711 µ-law / A-law
# --------------------------------------------------------------------------

# Shared decode algebra (ITU-T G.711, the Sun ulaw2linear/alaw2linear
# shift-add form), written once as SQL-dialect-neutral expressions over
# an unsigned byte u. Spark spells integer division DIV / shift
# shiftleft(1,e) / xor ^; DuckDB spells them // , << , xor().
def _ulaw_lin(u: str, dialect: str) -> str:
    c = f"(255 - {u})"  # ~u & 0xFF
    div = "DIV" if dialect == "spark" else "//"
    shl = (
        f"shiftleft(1, ({c} % 128) {div} 16)"
        if dialect == "spark"
        else f"(1 << (({c} % 128) // 16))"
    )
    return (
        f"(CASE WHEN {c} >= 128 THEN -1 ELSE 1 END)"
        f" * (((({c} % 128) % 16) * 8 + 132) * {shl} - 132)"
    )


def _alaw_lin(u: str, dialect: str) -> str:
    c = f"({u} ^ 85)" if dialect == "spark" else f"xor({u}, 85)"
    shl = (
        f"shiftleft(1, ({c} % 128) DIV 16 - 1)"
        if dialect == "spark"
        else f"(1 << (({c} % 128) // 16 - 1))"
    )
    mag = (
        f"(CASE WHEN ({c} % 128) {'DIV' if dialect == 'spark' else '//'} 16 = 0"
        f" THEN (({c} % 128) % 16) * 16 + 8"
        f" ELSE ((({c} % 128) % 16) * 16 + 264) * {shl} END)"
    )
    return f"(CASE WHEN {c} >= 128 THEN {mag} ELSE -{mag} END)"


@register(
    "multimodal_g711_decode_energy",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, hex(ENCODE(text)) AS hx,
             LEAST(OCTET_LENGTH(ENCODE(text)), 128) AS n
      FROM documents
    ), samp AS (
      SELECT doc_id, n, hx, UNNEST(range(0, 128)) AS k FROM b
    ), byt AS (
      SELECT doc_id, n, CAST({_duck_byte('hx', 'k')} AS INT) AS u
      FROM samp WHERE k < n
    ), lin AS (
      SELECT doc_id, n,
             CAST({_ulaw_lin('u', 'duck')} AS BIGINT) AS ul,
             CAST({_alaw_lin('u', 'duck')} AS BIGINT) AS al
      FROM byt
    )
    SELECT doc_id, CAST(MAX(n) AS INT) AS n_samples,
           CAST(SUM(ul) AS BIGINT) AS ulaw_sum,
           CAST(SUM(ul * ul) AS BIGINT) AS ulaw_energy,
           CAST(MAX(ABS(ul)) AS BIGINT) AS ulaw_peak,
           CAST(SUM(al) AS BIGINT) AS alaw_sum,
           CAST(SUM(al * al) AS BIGINT) AS alaw_energy,
           CAST(MAX(ABS(al)) AS BIGINT) AS alaw_peak
    FROM lin GROUP BY doc_id
    """,
    tags=("multimodal", "audio", "codec", "g711"),
)
def multimodal_g711_decode_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL G.711 telephony decode with ZERO Python and ZERO shuffle:
    each document's leading 128 bytes are treated as one µ-law and one
    A-law frame and expanded to linear PCM entirely inside whole-stage
    codegen — ``transform`` builds the byte array, the ITU shift-add
    algebra (mantissa·8+132 « exponent − 132 for µ-law; the xor-0x55 /
    segment-0 special case for A-law) runs per element, and
    ``aggregate`` folds sum/energy/peak without ever exploding rows.
    Every value is an exact integer, so the hash certifies the exact
    decode table. The oracle replays the identical algebra positionally
    from the hex bytes.

    Scale: map-only (one projection per document — no explode, no
    groupBy, no Python); at 100 TB this runs at parquet-scan speed.
    Reference analog: blow (maps/maps.go:8-21) has no binary decode
    vocabulary at all."""
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("content")
    )
    byte_arr = (
        "transform(sequence(0, CAST(LEAST(length(content), 128) AS INT) - 1),"
        " k -> CAST(conv(hex(substring(content, k + 1, 1)), 16, 10) AS INT))"
    )
    ul = f"transform({byte_arr}, u -> CAST({_ulaw_lin('u', 'spark')} AS BIGINT))"
    al = f"transform({byte_arr}, u -> CAST({_alaw_lin('u', 'spark')} AS BIGINT))"

    # ONE fold per codec with a struct accumulator — separate
    # sum/energy/peak folds would re-evaluate the decode transform per
    # output column (measured 3.2 s -> 1.2 s at sf0.1 for this query)
    def stats(arr: str, alias: str):
        return F.expr(
            f"aggregate({arr}, named_struct('s', 0L, 'e', 0L, 'p', 0L),"
            " (acc, x) -> named_struct("
            "'s', acc.s + x, 'e', acc.e + x * x, 'p', greatest(acc.p, abs(x))))"
        ).alias(alias)

    folded = d.select(
        "doc_id",
        F.expr("CAST(LEAST(length(content), 128) AS INT)").alias("n_samples"),
        stats(ul, "us"),
        stats(al, "als"),
    )
    return folded.select(
        "doc_id",
        "n_samples",
        F.col("us.s").alias("ulaw_sum"),
        F.col("us.e").alias("ulaw_energy"),
        F.col("us.p").alias("ulaw_peak"),
        F.col("als.s").alias("alaw_sum"),
        F.col("als.e").alias("alaw_energy"),
        F.col("als.p").alias("alaw_peak"),
    )


# --------------------------------------------------------------------------
# IMA / DVI ADPCM
# --------------------------------------------------------------------------


def _adpcm_oracle() -> str:
    steps = ", ".join(
        f"({i}, {s})" for i, s in enumerate(multimodal.ADPCM_STEP_TABLE)
    )
    return f"""
    WITH RECURSIVE
    stepv(i, s) AS (VALUES {steps}),
    b AS (
      SELECT doc_id, hex(ENCODE(text)) AS hx FROM documents
    ),
    nibv AS (
      -- nibble k of the first 32 bytes, LOW nibble first (IMA packing):
      -- byte j's hex digits sit at 1-based positions 2j+1 (high) and
      -- 2j+2 (low), so nibble 2j reads position 2j+2 and nibble 2j+1
      -- reads position 2j+1.
      -- the 0x08 byte mix toggles the LOW nibble's sign bit only
      -- (k even), so ASCII text yields alternating-sign diffs that
      -- exercise both automaton branches without rail-pinning
      SELECT doc_id, k,
             xor(CASE WHEN k % 2 = 0
                      THEN strpos('0123456789ABCDEF',
                                  substring(hx, CAST(k + 2 AS INT), 1)) - 1
                      ELSE strpos('0123456789ABCDEF',
                                  substring(hx, CAST(k AS INT), 1)) - 1
                 END, CASE WHEN k % 2 = 0 THEN 8 ELSE 0 END) AS v
      FROM (SELECT doc_id, hx, UNNEST(range(0, 64)) AS k FROM b)
    ),
    dec AS (
      SELECT doc_id, -1 AS k, 0 AS pred, 0 AS idx,
             CAST(0 AS BIGINT) AS sum_samples, CAST(0 AS BIGINT) AS energy
      FROM b
      UNION ALL
      SELECT doc_id, k, pred, idx,
             sum_samples + pred AS sum_samples,
             energy + CAST(pred AS BIGINT) * pred AS energy
      FROM (
        SELECT q.doc_id, q.k,
               GREATEST(-32768, LEAST(32767, q.pred0 + q.sdiff)) AS pred,
               GREATEST(0, LEAST(88, q.idx0 +
                 CASE q.v % 8 WHEN 4 THEN 2 WHEN 5 THEN 4
                              WHEN 6 THEN 6 WHEN 7 THEN 8
                              ELSE -1 END)) AS idx,
               q.sum_samples, q.energy
        FROM (
          SELECT d.doc_id, d.k + 1 AS k, d.pred AS pred0, d.idx AS idx0,
                 d.sum_samples, d.energy, nv.v,
                 (CASE WHEN nv.v >= 8 THEN -1 ELSE 1 END) *
                 (s.s // 8
                  + CASE WHEN nv.v % 2 = 1 THEN s.s // 4 ELSE 0 END
                  + CASE WHEN (nv.v // 2) % 2 = 1 THEN s.s // 2 ELSE 0 END
                  + CASE WHEN (nv.v // 4) % 2 = 1 THEN s.s ELSE 0 END) AS sdiff
          FROM dec d
          JOIN nibv nv ON nv.doc_id = d.doc_id AND nv.k = d.k + 1
          JOIN stepv s ON s.i = d.idx
          WHERE d.k < 63
        ) q
      )
    )
    SELECT doc_id, CAST(64 AS INT) AS n_samples,
           CAST(pred AS INT) AS final_predictor,
           CAST(idx AS INT) AS final_step_index,
           sum_samples, energy
    FROM dec WHERE k = 63
    """


@register(
    "multimodal_adpcm_decode_energy",
    oracle=_adpcm_oracle(),
    tags=("multimodal", "audio", "codec", "adpcm"),
)
def multimodal_adpcm_decode_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-audio decode of a genuinely STATEFUL codec under
    the oracle gate: each document's leading 32 bytes are an IMA/DVI
    ADPCM stream (two 4-bit codes per byte, low nibble first), expanded
    through the standard 89-entry step table and index automaton by
    ``multimodal.decode_adpcm_ima`` — the same algorithm the late
    stdlib ``audioop`` shipped. The oracle replays the identical
    automaton as a 64-step DuckDB RECURSIVE CTE carrying
    (predictor, step_index, Σx, Σx²) per document, so one wrong shift,
    clamp, nibble order, or table entry breaks the hash on every row.
    This closes the 'compressed audio is stubbed' asterisk the way PNG
    (round 9) and JPEG (round 11) were closed for images.

    Scale: Arrow-batched mapInPandas, one output row per document,
    nothing shuffles; decode state is per-document (embarrassingly
    parallel — real ADPCM containers reset state per block header,
    which is exactly this shape). Reference analog: none — blow has no
    codec surface."""
    import pandas as pd

    from blow_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("content")
    )

    def dec(batches):
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                # 0x08 toggles the LOW nibble's sign bit so ASCII text
                # yields alternating-sign diffs (both automaton branches)
                data = bytes(
                    b ^ 0x08 for b in bytes(content)[:32].ljust(32, b"\0")
                )
                s = multimodal.decode_adpcm_ima(data).astype("int64")
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_samples": len(s),
                        "final_predictor": int(s[-1]),
                        "final_step_index": _adpcm_final_index(data),
                        "sum_samples": int(s.sum()),
                        "energy": int((s * s).sum()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_samples",
                    "final_predictor",
                    "final_step_index",
                    "sum_samples",
                    "energy",
                ],
            )

    return d.mapInPandas(
        dec,
        "doc_id long, n_samples int, final_predictor int, "
        "final_step_index int, sum_samples long, energy long",
    )


def _adpcm_final_index(data: bytes) -> int:
    """Step-index after decoding ``data`` — replayed index-only (the
    index path is input-only, so this stays O(n) with no sample buffer)."""
    idx = 0
    for byte in data:
        for nib in (byte & 0x0F, byte >> 4):
            idx = max(0, min(88, idx + multimodal.ADPCM_INDEX_TABLE[nib]))
    return idx


# --------------------------------------------------------------------------
# MPEG-1 Layer III frame header
# --------------------------------------------------------------------------

_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_RATES = (44100, 48000, 32000)
_MP3_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")


@register(
    "multimodal_mp3_frame_header",
    oracle=f"""
    SELECT doc_id,
           CAST(1 AS BIGINT) AS sync_ok,
           CAST(3 AS BIGINT) AS mpeg_version,
           CAST(1 AS BIGINT) AS layer_code,
           CAST(([{', '.join(str(b) for b in _MP3_BITRATES[1:])}])[CAST(doc_id % 14 + 1 AS INT)]
                AS BIGINT) AS bitrate_kbps,
           CAST(([{', '.join(str(r) for r in _MP3_RATES)}])[CAST(doc_id % 3 + 1 AS INT)]
                AS BIGINT) AS sample_rate,
           CAST(doc_id % 2 AS BIGINT) AS padding,
           (['{"', '".join(_MP3_MODES)}'])[CAST(doc_id % 4 + 1 AS INT)] AS channel_mode,
           CAST(144000 * ([{', '.join(str(b) for b in _MP3_BITRATES[1:])}])[CAST(doc_id % 14 + 1 AS INT)]
                // ([{', '.join(str(r) for r in _MP3_RATES)}])[CAST(doc_id % 3 + 1 AS INT)]
                + doc_id % 2 AS BIGINT) AS frame_bytes,
           CAST(1152000000 // ([{', '.join(str(r) for r in _MP3_RATES)}])[CAST(doc_id % 3 + 1 AS INT)]
                AS BIGINT) AS frame_duration_us
    FROM documents
    """,
    tags=("multimodal", "audio", "mp3", "codec"),
)
def multimodal_mp3_frame_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MPEG-1 Layer III frame-header parse — the ZERO-DECODE container
    pass over MP3 objects (the round-10 PNG-header-parser shape, for
    audio): genuine 4-byte frame headers are built in-plan (sync word
    0xFFE, version/layer bits, bitrate/samplerate/padding/mode fields
    varying per document), then PARSED BACK from the bytes with JVM bit
    arithmetic and the ISO/IEC 11172-3 bitrate and samplerate tables to
    recover the stream facts an ingest pipeline catalogs before any
    decode: kbps, Hz, channel mode, exact frame byte length
    (⌊144·bitrate/samplerate⌋+padding) and frame duration (1152
    samples). The oracle derives the same facts arithmetically — a
    wrong bit offset, a swapped table entry, or a broken sync check
    breaks every row.

    Scale: map-only JVM expressions, zero Python, zero shuffle; at
    100 TB this is the metadata pass that decides routing/sampling
    without touching audio payloads. Reference analog: none."""
    d = read_table(spark, sf_dir, "documents").select("doc_id")
    hdr = F.expr(
        "unhex(concat('FFFB',"
        " lpad(hex((pmod(doc_id, 14) + 1) * 16 + pmod(doc_id, 3) * 4"
        "          + pmod(doc_id, 2) * 2), 2, '0'),"
        " lpad(hex(pmod(doc_id, 4) * 64), 2, '0')))"
    )
    d = d.withColumn("hdr", hdr)
    byte = lambda i: f"CAST(conv(hex(substring(hdr, {i + 1}, 1)), 16, 10) AS INT)"  # noqa: E731
    brs = ", ".join(str(b) for b in _MP3_BITRATES)
    rates = ", ".join(str(r) for r in _MP3_RATES) + ", 0"
    modes = ", ".join(f"'{m}'" for m in _MP3_MODES)
    # element_at requires an INT index; DIV yields BIGINT, so re-cast
    bitrate = f"element_at(array({brs}), CAST({byte(2)} DIV 16 + 1 AS INT))"
    srate = f"element_at(array({rates}), CAST(({byte(2)} DIV 4) % 4 + 1 AS INT))"
    return d.select(
        "doc_id",
        F.expr(
            f"CAST({byte(0)} = 255 AND {byte(1)} >= 224 AS BIGINT)"
        ).alias("sync_ok"),
        F.expr(f"CAST(({byte(1)} DIV 8) % 4 AS BIGINT)").alias("mpeg_version"),
        F.expr(f"CAST(({byte(1)} DIV 2) % 4 AS BIGINT)").alias("layer_code"),
        F.expr(f"CAST({bitrate} AS BIGINT)").alias("bitrate_kbps"),
        F.expr(f"CAST({srate} AS BIGINT)").alias("sample_rate"),
        F.expr(f"CAST(({byte(2)} DIV 2) % 2 AS BIGINT)").alias("padding"),
        F.expr(
            f"element_at(array({modes}), CAST({byte(3)} DIV 64 + 1 AS INT))"
        ).alias("channel_mode"),
        F.expr(
            f"CAST(144000 * {bitrate} DIV {srate}"
            f" + ({byte(2)} DIV 2) % 2 AS BIGINT)"
        ).alias("frame_bytes"),
        F.expr(
            f"CAST(1152000000 DIV {srate} AS BIGINT)"
        ).alias("frame_duration_us"),
    )


# --------------------------------------------------------------------------
# GIF89a logical screen descriptor
# --------------------------------------------------------------------------


@register(
    "multimodal_gif_header_meta",
    oracle="""
    WITH b AS (
      SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS nb FROM documents
    )
    SELECT doc_id, 'GIF89a' AS magic,
           CAST(nb % 613 + 16 AS BIGINT) AS width,
           CAST((nb * 7) % 427 + 16 AS BIGINT) AS height,
           CAST(1 AS BIGINT) AS gct_flag,
           CAST(nb % 8 AS BIGINT) AS color_res,
           CAST(1 << ((nb * 3) % 8 + 1) AS BIGINT) AS gct_entries,
           CAST(3 * (1 << ((nb * 3) % 8 + 1)) AS BIGINT) AS gct_bytes,
           CAST(nb % 256 AS BIGINT) AS bg_index
    FROM b
    """,
    tags=("multimodal", "image", "gif", "codec"),
)
def multimodal_gif_header_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF89a header + logical-screen-descriptor parse, zero-decode:
    genuine 13-byte GIF headers are built in-plan (magic, LITTLE-ENDIAN
    u16 canvas dimensions, the packed byte carrying global-color-table
    flag / color resolution / GCT size exponent, background index),
    then parsed back from the BYTES — the LE byte order and the
    2^(N+1)-entry GCT sizing rule are exactly the fields a naive parser
    gets wrong, and either mistake breaks the hash. The oracle
    recomputes the planted fields from each document's byte length.

    Scale: map-only JVM expressions, zero Python, zero shuffle — the
    object-catalog pass of an image-corpus ingest. Reference analog:
    none (blow moves opaque bytes)."""
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.length(F.encode("text", "UTF-8")).alias("nb")
    )
    gif = F.concat(
        F.lit(b"GIF89a"),
        F.expr(
            "unhex(concat("
            " lpad(hex((nb % 613 + 16) % 256), 2, '0'),"
            " lpad(hex((nb % 613 + 16) DIV 256), 2, '0'),"
            " lpad(hex(((nb * 7) % 427 + 16) % 256), 2, '0'),"
            " lpad(hex(((nb * 7) % 427 + 16) DIV 256), 2, '0'),"
            " lpad(hex(128 + (nb % 8) * 16 + (nb * 3) % 8), 2, '0'),"
            " lpad(hex(nb % 256), 2, '0'),"
            " '00'))"
        ),
    )
    d = d.withColumn("gif", gif)
    byte = lambda i: f"CAST(conv(hex(substring(gif, {i + 1}, 1)), 16, 10) AS INT)"  # noqa: E731
    return d.select(
        "doc_id",
        F.decode(F.substring("gif", 1, 6), "UTF-8").alias("magic"),
        F.expr(f"CAST({byte(6)} + 256 * {byte(7)} AS BIGINT)").alias("width"),
        F.expr(f"CAST({byte(8)} + 256 * {byte(9)} AS BIGINT)").alias("height"),
        F.expr(f"CAST({byte(10)} DIV 128 AS BIGINT)").alias("gct_flag"),
        F.expr(f"CAST(({byte(10)} DIV 16) % 8 AS BIGINT)").alias("color_res"),
        F.expr(f"CAST(shiftleft(1, {byte(10)} % 8 + 1) AS BIGINT)").alias(
            "gct_entries"
        ),
        F.expr(
            f"CAST(3 * shiftleft(1, {byte(10)} % 8 + 1) AS BIGINT)"
        ).alias("gct_bytes"),
        F.expr(f"CAST({byte(11)} AS BIGINT)").alias("bg_index"),
    )


# --------------------------------------------------------------------------
# Uncompressed 24-bit BMP
# --------------------------------------------------------------------------

_BMP_W, _BMP_H = 6, 8
_BMP_STRIDE = (_BMP_W * 3 + 3) // 4 * 4  # 20 — includes 2 pad bytes/row
_BMP_PIXBYTES = _BMP_STRIDE * _BMP_H  # 160


def _bmp_header() -> bytes:
    """Canonical BITMAPFILEHEADER + BITMAPINFOHEADER for a 6x8
    bottom-up 24-bit uncompressed DIB — constant because the pixel
    array below is fixed-size, so it rides as a binary literal."""
    return (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + _BMP_PIXBYTES, 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII",
            40, _BMP_W, _BMP_H, 1, 24, 0, _BMP_PIXBYTES, 2835, 2835, 0, 0,
        )
    )


@register(
    "multimodal_bmp_decode_stats",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, hex(ENCODE(text)) AS hx,
             OCTET_LENGTH(ENCODE(text)) AS n
      FROM documents
    ), pos AS (
      SELECT doc_id, n, hx, UNNEST(range(0, {_BMP_PIXBYTES})) AS k FROM b
    ), px AS (
      -- byte k of the pixel array: row-from-bottom k//20, skip the two
      -- stride-pad bytes, channel order B,G,R within a pixel
      SELECT doc_id,
             CASE WHEN k < n THEN {_duck_byte('hx', 'k')} ELSE 0 END AS v,
             CAST({_BMP_H - 1} - k // {_BMP_STRIDE} AS INT) AS r_img,
             CAST((k % {_BMP_STRIDE}) % 3 AS INT) AS ch
      FROM pos WHERE k % {_BMP_STRIDE} < {_BMP_W * 3}
    )
    SELECT doc_id, CAST({_BMP_H} AS INT) AS height, CAST({_BMP_W} AS INT) AS width,
           CAST(SUM(CASE WHEN ch = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
           CAST(SUM(CASE WHEN ch = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
           CAST(SUM(CASE WHEN ch = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
           CAST(SUM(v * (1 + r_img)) AS BIGINT) AS row_weighted_sum
    FROM px GROUP BY doc_id
    """,
    tags=("multimodal", "image", "bmp", "codec"),
)
def multimodal_bmp_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL uncompressed-BMP decode under the oracle gate: each
    document's leading {_BMP_PIXBYTES} bytes become the pixel array of
    a genuine 6x8 bottom-up 24-bit BMP (constant 54-byte header built
    by ``_bmp_header``, width 6 chosen so every row carries 2 REAL
    stride-pad bytes), decoded by ``multimodal._decode_bmp`` — which
    must parse the declared pixel-array offset, honor the 4-byte row
    stride, flip bottom-up to top-down, and swap BGR→RGB. Per-channel
    sums gate the channel swap; the row-weighted checksum
    Σ v·(1+row_from_top) gates the flip AND the stride (a decoder that
    forgot padding shifts every row assignment). The oracle recomputes
    all of it positionally from the raw text bytes.

    Scale: Arrow-batched mapInPandas decode, one row out per document,
    map-only. Reference analog: none."""
    import numpy as np
    import pandas as pd

    from blow_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("content")
    )
    bmp = F.concat(
        F.lit(_bmp_header()),
        F.rpad(
            F.substring(F.col("content"), 1, _BMP_PIXBYTES),
            _BMP_PIXBYTES,
            bytes([0]),
        ),
    )
    d = d.select("doc_id", bmp.alias("bmp"))

    def dec(batches):
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["bmp"]):
                img = multimodal.decode_image(bytes(blob)).astype(np.int64)
                rw = (img.sum(axis=(1, 2)) * (1 + np.arange(img.shape[0]))).sum()
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "height": img.shape[0],
                        "width": img.shape[1],
                        "sum_r": int(img[:, :, 0].sum()),
                        "sum_g": int(img[:, :, 1].sum()),
                        "sum_b": int(img[:, :, 2].sum()),
                        "row_weighted_sum": int(rw),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "height", "width",
                    "sum_r", "sum_g", "sum_b", "row_weighted_sum",
                ],
            )

    return d.mapInPandas(
        dec,
        "doc_id long, height int, width int, sum_r long, sum_g long, "
        "sum_b long, row_weighted_sum long",
    )


# --------------------------------------------------------------------------
# Indexed-color (palette) PNG
# --------------------------------------------------------------------------


@register(
    "multimodal_png_palette_decode",
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(ENCODE(text)) AS hx, OCTET_LENGTH(ENCODE(text)) AS n
      FROM documents WHERE doc_id < 50
    ), pos AS (
      SELECT doc_id, n, hx, UNNEST(range(0, 64)) AS k FROM b
    ), px AS (
      SELECT doc_id, k,
             (CASE WHEN k < n
                   THEN (strpos('0123456789ABCDEF',
                                substring(hx, CAST(2*k+1 AS INT), 1)) - 1) * 16
                      + (strpos('0123456789ABCDEF',
                                substring(hx, CAST(2*k+2 AS INT), 1)) - 1)
                   ELSE 0 END) % 64 AS idx
      FROM pos
    ), rgb AS (
      SELECT doc_id, k,
             (37 * idx) % 256 AS r, (73 * idx) % 256 AS g,
             (151 * idx) % 256 AS bl
      FROM px
    )
    SELECT doc_id, CAST(8 AS INT) AS height, CAST(8 AS INT) AS width,
           CAST(SUM(r) AS BIGINT) AS sum_r,
           CAST(SUM(g) AS BIGINT) AS sum_g,
           CAST(SUM(bl) AS BIGINT) AS sum_b,
           CAST(SUM((r + g + bl) * (k + 1)) AS BIGINT) AS pos_checksum
    FROM rgb GROUP BY doc_id
    """,
    tags=("multimodal", "image", "png", "codec"),
)
def multimodal_png_palette_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL INDEXED-COLOR PNG decode under the oracle gate — the
    color-type-3 close that widens the round-9 PNG subset: genuine
    palette PNGs on disk (stdlib ``encode_png_indexed``: IHDR color 3 +
    a PLTE chunk + filter-0 rows of 8-bit indices), scanned with
    binaryFile, decoded by ``_decode_png``'s round-11 indexed branch —
    which must parse the PLTE chunk, bound-check indices, and map every
    pixel through the palette. The 64-entry fixture palette's channels
    are three DISTINCT permutations of the index space (odd multipliers
    coprime with 256), so a channel swap, palette-order slip, or
    index-vs-color confusion changes the per-channel sums; the
    position-weighted checksum gates pixel ORDER through the filter
    reconstruction. The oracle recomputes everything from the raw text
    bytes (index = byte mod 64 -> closed-form palette arithmetic).

    Scale: parallel binaryFile scan -> map-only decode -> narrow stats,
    the identical plan shape as the JPEG/PNG ingest queries; at 100 TB
    only the object-store URI changes. Reference analog: none."""
    import os

    import numpy as np
    import pandas as pd

    from blow_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    img_dir = multimodal.palette_png_fixture_dir(spark, sf_dir, n_docs=50)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(img_dir)
    )

    def dec(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                img = multimodal.decode_image(bytes(content)).astype(np.int64)
                weights = 1 + np.arange(img.shape[0] * img.shape[1]).reshape(
                    img.shape[0], img.shape[1]
                )
                rows.append(
                    {
                        "doc_id": int(
                            os.path.splitext(os.path.basename(path))[0]
                        ),
                        "height": img.shape[0],
                        "width": img.shape[1],
                        "sum_r": int(img[:, :, 0].sum()),
                        "sum_g": int(img[:, :, 1].sum()),
                        "sum_b": int(img[:, :, 2].sum()),
                        "pos_checksum": int(
                            (img.sum(axis=2) * weights).sum()
                        ),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "height", "width",
                    "sum_r", "sum_g", "sum_b", "pos_checksum",
                ],
            )

    return files.select("path", "content").mapInPandas(
        dec,
        "doc_id long, height int, width int, sum_r long, sum_g long, "
        "sum_b long, pos_checksum long",
    )


# --------------------------------------------------------------------------
# WAV IMA-ADPCM container (compressed audio end to end)
# --------------------------------------------------------------------------


def _wav_adpcm_header() -> bytes:
    """Constant RIFF/WAVE + fmt(0x11) + data-size prefix for exactly one
    36-byte mono IMA-ADPCM block (65 samples) — the varying block header
    and payload are appended in-plan."""
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 8000 * 36 // 65, 36, 4, 2, 65)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 36)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", 36)
    )


def _wav_adpcm_oracle() -> str:
    steps = ", ".join(
        f"({i}, {s})" for i, s in enumerate(multimodal.ADPCM_STEP_TABLE)
    )
    return f"""
    WITH RECURSIVE
    stepv(i, s) AS (VALUES {steps}),
    b AS (
      SELECT doc_id, hex(ENCODE(text)) AS hx,
             OCTET_LENGTH(ENCODE(text)) AS nb,
             CAST((doc_id * 97) % 4001 - 2000 AS INT) AS p0,
             CAST(doc_id % 89 AS INT) AS i0
      FROM documents
    ),
    nibv AS (
      -- nibble k of the first 32 payload bytes (low nibble first);
      -- bytes past the document length are the rpad zeros
      SELECT doc_id, k,
             CASE WHEN k // 2 < nb THEN
               CASE WHEN k % 2 = 0
                    THEN strpos('0123456789ABCDEF',
                                substring(hx, CAST(k + 2 AS INT), 1)) - 1
                    ELSE strpos('0123456789ABCDEF',
                                substring(hx, CAST(k AS INT), 1)) - 1
               END
             ELSE 0 END AS v
      FROM (SELECT doc_id, hx, nb, UNNEST(range(0, 64)) AS k FROM b)
    ),
    dec AS (
      -- the block header's seed predictor IS the first output sample
      SELECT doc_id, -1 AS k, p0 AS pred, i0 AS idx,
             CAST(p0 AS BIGINT) AS sum_samples,
             CAST(p0 AS BIGINT) * p0 AS energy
      FROM b
      UNION ALL
      SELECT doc_id, k, pred, idx,
             sum_samples + pred AS sum_samples,
             energy + CAST(pred AS BIGINT) * pred AS energy
      FROM (
        SELECT q.doc_id, q.k,
               GREATEST(-32768, LEAST(32767, q.pred0 + q.sdiff)) AS pred,
               GREATEST(0, LEAST(88, q.idx0 +
                 CASE q.v % 8 WHEN 4 THEN 2 WHEN 5 THEN 4
                              WHEN 6 THEN 6 WHEN 7 THEN 8
                              ELSE -1 END)) AS idx,
               q.sum_samples, q.energy
        FROM (
          SELECT d.doc_id, d.k + 1 AS k, d.pred AS pred0, d.idx AS idx0,
                 d.sum_samples, d.energy, nv.v,
                 (CASE WHEN nv.v >= 8 THEN -1 ELSE 1 END) *
                 (s.s // 8
                  + CASE WHEN nv.v % 2 = 1 THEN s.s // 4 ELSE 0 END
                  + CASE WHEN (nv.v // 2) % 2 = 1 THEN s.s // 2 ELSE 0 END
                  + CASE WHEN (nv.v // 4) % 2 = 1 THEN s.s ELSE 0 END) AS sdiff
          FROM dec d
          JOIN nibv nv ON nv.doc_id = d.doc_id AND nv.k = d.k + 1
          JOIN stepv s ON s.i = d.idx
          WHERE d.k < 63
        ) q
      )
    )
    SELECT dec.doc_id, CAST(65 AS INT) AS n_samples,
           CAST(b.p0 AS INT) AS first_sample,
           CAST(dec.pred AS INT) AS final_sample,
           dec.sum_samples, dec.energy
    FROM dec JOIN b USING (doc_id) WHERE dec.k = 63
    """


@register(
    "multimodal_wav_adpcm_decode",
    oracle=_wav_adpcm_oracle(),
    tags=("multimodal", "audio", "codec", "adpcm", "wav"),
)
def multimodal_wav_adpcm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPRESSED audio in a REAL container, end to end: each document
    becomes a genuine mono WAV whose fmt chunk declares IMA-ADPCM
    (wFormatTag 0x11) and whose single 36-byte data block carries a
    PLANTED seed state — int16 predictor ((97·doc_id) mod 4001 − 2000,
    little-endian two's complement built by in-plan byte algebra) and
    step index (doc_id mod 89) — followed by 32 payload bytes. The
    stdlib ``wave`` module CANNOT read this; ``decode_audio`` routes it
    to ``multimodal.decode_wav_adpcm``, which must walk the RIFF
    chunks, read the fmt tag and block alignment, emit the seed
    predictor as the block's first sample (the IMA container rule), and
    expand 64 codes from the seeded automaton. The oracle replays the
    seeded automaton as a recursive CTE; first/final samples and the
    exact Σx/Σx² over all 65 samples gate header layout, seed
    endianness (negative predictors planted on purpose), and the
    decode itself.

    Scale: map-only Arrow-batched decode, one row per document —
    identical plan shape at 100 TB of real audio objects. Reference
    analog: none; completes the raw-nibble
    ``multimodal_adpcm_decode_energy`` into the container form."""
    import numpy as np
    import pandas as pd

    from blow_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("content")
    )
    blk_hdr = F.expr(
        "unhex(concat("
        " lpad(hex(pmod(pmod(doc_id * 97, 4001) - 2000, 65536) % 256), 2, '0'),"
        " lpad(hex(pmod(pmod(doc_id * 97, 4001) - 2000, 65536) DIV 256), 2, '0'),"
        " lpad(hex(pmod(doc_id, 89)), 2, '0'), '00'))"
    )
    wav = F.concat(
        F.lit(_wav_adpcm_header()),
        blk_hdr,
        F.rpad(F.substring(F.col("content"), 1, 32), 32, bytes([0])),
    )
    d2 = d.select("doc_id", wav.alias("wav"))

    def dec(batches):
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["wav"]):
                f = multimodal.decode_audio(bytes(blob))
                s = np.round(f.astype(np.float64) * 32768.0).astype(np.int64)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_samples": len(s),
                        "first_sample": int(s[0]),
                        "final_sample": int(s[-1]),
                        "sum_samples": int(s.sum()),
                        "energy": int((s * s).sum()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "first_sample",
                    "final_sample", "sum_samples", "energy",
                ],
            )

    return d2.mapInPandas(
        dec,
        "doc_id long, n_samples int, first_sample int, final_sample int, "
        "sum_samples long, energy long",
    )


# --------------------------------------------------------------------------
# TIFF header / IFD walk (both byte orders)
# --------------------------------------------------------------------------


@register(
    "multimodal_tiff_header_meta",
    oracle="""
    WITH b AS (
      SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS nb FROM documents
    )
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
           CAST(3 AS BIGINT) AS n_entries,
           CAST(nb % 4093 + 16 AS BIGINT) AS width,
           CAST((nb * 11) % 2039 + 16 AS BIGINT) AS height,
           CAST(CASE WHEN nb % 3 = 0 THEN 8 ELSE 16 END AS BIGINT)
             AS bits_per_sample
    FROM b
    """,
    tags=("multimodal", "image", "tiff", "codec"),
)
def multimodal_tiff_header_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIFF header + IFD walk, zero-decode, BOTH byte orders: each
    document gets a genuine little-endian ("II*\\0") or big-endian
    ("MM\\0*") TIFF built in-plan — magic, IFD offset, a 3-entry IFD
    carrying ImageWidth (256), ImageLength (257) and BitsPerSample
    (258) as SHORT values — with the endianness chosen by doc parity,
    then PARSED BACK from the bytes: the parser must read the byte-
    order mark first and apply it to every u16/u32 that follows, which
    is exactly the mistake class (half-swapped parsers) that corrupts
    real TIFF ingests. The oracle recomputes the planted fields
    arithmetically; a parser that ignores the mark gets every odd-doc
    row wrong.

    Scale: map-only JVM expressions, zero Python, zero shuffle — the
    object-catalog pass over TIFF corpora. Reference analog: none;
    completes the PNG/GIF/MP3/BMP header-parse family with the one
    format where byte order itself is data."""
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.length(F.encode("text", "UTF-8")).alias("nb")
    )
    # planted values
    w = "(nb % 4093 + 16)"
    h = "((nb * 11) % 2039 + 16)"
    bps = "(CASE WHEN nb % 3 = 0 THEN 8 ELSE 16 END)"
    le = "doc_id % 2 = 0"

    def u16(v: str) -> str:
        """hex of a u16 in the doc's byte order (II = lo,hi; MM = hi,lo)."""
        lo, hi = f"lpad(hex({v} % 256), 2, '0')", f"lpad(hex({v} DIV 256), 2, '0')"
        return f"(CASE WHEN {le} THEN concat({lo}, {hi}) ELSE concat({hi}, {lo}) END)"

    def u32(v: str) -> str:
        b0 = f"lpad(hex({v} % 256), 2, '0')"
        b1 = f"lpad(hex(({v} DIV 256) % 256), 2, '0')"
        b2 = f"lpad(hex(({v} DIV 65536) % 256), 2, '0')"
        b3 = f"lpad(hex(({v} DIV 16777216) % 256), 2, '0')"
        return (
            f"(CASE WHEN {le} THEN concat({b0}, {b1}, {b2}, {b3})"
            f" ELSE concat({b3}, {b2}, {b1}, {b0}) END)"
        )

    def entry(tag: int, v: str) -> str:
        # tag(u16), type 3=SHORT(u16), count 1(u32), value u16 + pad u16
        return (
            f"concat({u16(str(tag))}, {u16('3')}, {u32('1')},"
            f" {u16(v)}, {u16('0')})"
        )

    tiff = F.expr(
        "unhex(concat("
        f" CASE WHEN {le} THEN '49492A00' ELSE '4D4D002A' END,"  # magic
        f" {u32('8')},"  # IFD offset = 8
        f" {u16('3')},"  # entry count
        f" {entry(256, w)}, {entry(257, h)}, {entry(258, bps)},"
        f" {u32('0')}))"  # next-IFD = none
    )
    d = d.withColumn("tif", tiff)
    byte = lambda i: f"CAST(conv(hex(substring(tif, {i} + 1, 1)), 16, 10) AS INT)"  # noqa: E731
    is_le = f"({byte(0)} = 73)"  # 'I' = 0x49

    def rd16(off: int) -> str:
        return (
            f"(CASE WHEN {is_le} THEN {byte(off)} + 256 * {byte(off + 1)}"
            f" ELSE 256 * {byte(off)} + {byte(off + 1)} END)"
        )

    # IFD at offset 8: count(2) then 12-byte entries; value SHORT sits at
    # entry offset +8
    def entry_val(k: int) -> str:
        return rd16(8 + 2 + 12 * k + 8)

    return d.select(
        "doc_id",
        F.expr(
            f"CASE WHEN {is_le} THEN 'II' ELSE 'MM' END"
        ).alias("byte_order"),
        F.expr(f"CAST({rd16(8)} AS BIGINT)").alias("n_entries"),
        F.expr(f"CAST({entry_val(0)} AS BIGINT)").alias("width"),
        F.expr(f"CAST({entry_val(1)} AS BIGINT)").alias("height"),
        F.expr(f"CAST({entry_val(2)} AS BIGINT)").alias("bits_per_sample"),
    )


# --------------------------------------------------------------------------
# GIF LZW pixel decode (round 13) — the header-only GIF row above gains
# a REAL decompression twin
# --------------------------------------------------------------------------


def _gif_lzw_oracle() -> str:
    """Channel sums replayed from the generation formulas alone (LZW is
    lossless): row r uses byte v_r; its 48 columns hit palette slots
    (v_r + c//4) % 16 — each of 12 consecutive slots exactly 4 times —
    and the palette itself is the closed formula shared with
    multimodal.gif_fixture_palette."""
    return """
    WITH b AS (
      SELECT doc_id, hex(ENCODE(text)) AS hx, OCTET_LENGTH(ENCODE(text)) AS n
      FROM documents WHERE doc_id < 50
    ), rows_ AS (
      SELECT doc_id, n, hx, UNNEST(range(0, 48)) AS k FROM b
    ), vals AS (
      SELECT doc_id,
             CASE WHEN k < LEAST(n, 48)
                  THEN (strpos('0123456789ABCDEF',
                               substring(hx, CAST(2*k+1 AS INT), 1)) - 1) * 16
                     + (strpos('0123456789ABCDEF',
                               substring(hx, CAST(2*k+2 AS INT), 1)) - 1)
                  ELSE 0 END AS v
      FROM rows_
    ), slots AS (
      SELECT doc_id, (v + j) % 16 AS s
      FROM (SELECT doc_id, v, UNNEST(range(0, 12)) AS j FROM vals)
    )
    SELECT doc_id, CAST(48 AS INT) AS height, CAST(48 AS INT) AS width,
           CAST(2304 AS INT) AS n_px,
           CAST(4 * SUM((s * 37 + 11) % 256) AS BIGINT) AS r_sum,
           CAST(4 * SUM((s * 73 + 5) % 256) AS BIGINT) AS g_sum,
           CAST(4 * SUM((s * 151 + 3) % 256) AS BIGINT) AS b_sum,
           (doc_id % 2 = 1) AS interlaced
    FROM slots GROUP BY doc_id
    ORDER BY doc_id
    """


@register(
    "multimodal_gif_lzw_decode_stats",
    oracle=_gif_lzw_oracle(),
    tags=("multimodal", "binaryfile", "codec", "gif"),
)
def multimodal_gif_lzw_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode under the oracle gate (round 13) — closes the
    codec shelf's last zero-decode gap: where multimodal_gif_header_meta
    stops at the logical screen descriptor, this decompresses the
    actual LZW pixel stream. Genuine .gif files on disk
    (multimodal.encode_gif — GIF89a spec Appendix F: variable-width
    codes from min_code_size+1 bits, LSB-first packing, CLEAR/EOI,
    width bumps at 2^w, 12-bit cap with dictionary reset, 255-byte
    sub-block framing; odd doc_ids written INTERLACED so the 4-pass
    row order rides the gate too), scanned with binaryFile and decoded
    FOR REAL by multimodal.decode_gif inside mapInPandas, reduced to
    per-image per-channel pixel sums plus the realized interlace flag
    parsed from the image-descriptor byte.

    GIF's LZW is LOSSLESS, so the oracle replays the fixture's
    generation formulas alone (index = (byte + col//4) % 16 through the
    closed-form 16-color palette) and any codec defect — a wrong width
    bump, a swapped CLEAR/EOI, a bad sub-block stitch, a broken
    deinterlace — breaks the channel sums. Plan shape: parallel file
    scan -> map-only decode -> narrow stats; at 100 TB only the
    object-store URI changes. Reference analog: none (the reference
    has no codecs); LZW per Welch 1984 + the GIF89a specification."""
    import os

    import numpy as np
    import pandas as pd

    from blow_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    img_dir = multimodal.gif_corpus_fixture_dir(spark, sf_dir, n_docs=50)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.gif")
        .load(img_dir)
    )

    def decode(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                blob = bytes(content)
                img = multimodal.decode_gif(blob)
                s = img.astype(np.int64).sum(axis=(0, 1))
                rows.append(
                    {
                        "doc_id": int(os.path.splitext(os.path.basename(path))[0]),
                        "height": img.shape[0],
                        "width": img.shape[1],
                        "n_px": int(img.shape[0] * img.shape[1]),
                        "r_sum": int(s[0]),
                        "g_sum": int(s[1]),
                        "b_sum": int(s[2]),
                        # image descriptor's packed byte: 13-byte header
                        # + 48-byte GCT + 9 bytes into the descriptor
                        "interlaced": bool(blob[70] & 0x40),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "height", "width", "n_px",
                    "r_sum", "g_sum", "b_sum", "interlaced",
                ],
            )

    return files.select("path", "content").mapInPandas(
        decode,
        "doc_id long, height int, width int, n_px int, "
        "r_sum long, g_sum long, b_sum long, interlaced boolean",
    )
