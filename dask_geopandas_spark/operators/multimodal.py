"""Multimodal (image/audio/video) column plumbing for training-data
pipelines (BASELINE.json north star).

Media payloads are opaque ``binary`` columns with a typed metadata struct.
The Spark-side machinery — schemas, Arrow batch shapes, mapInPandas
partitioned decode, frame sampling fan-out — is real and tested; the
*codec* step is a deterministic stub because no image/audio libraries
exist in this container (decode_image raises unless the payload uses the
engine's own FAKE header, which tests and synthetic pipelines generate).

At scale: decode runs inside mapInPandas so each task holds only its
Arrow batch; fan-out operators (frame sampling) emit rows instead of
arrays to keep row sizes bounded for shuffle.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..barrier import plan_barrier

FAKE_MAGIC = b"FAKEIMG1"

IMAGE_META_SCHEMA = StructType([
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("format", StringType()),
    StructField("size_bytes", LongType()),
])


def make_fake_image(width: int, height: int, channels: int = 3, seed: int = 0) -> bytes:
    """Deterministic synthetic payload: header + seeded byte pattern."""
    head = FAKE_MAGIC + struct.pack("<III", width, height, channels)
    n = min(width * height * channels, 4096)
    rng = np.random.RandomState(seed)
    return head + rng.randint(0, 256, n, dtype=np.uint8).tobytes()


def decode_image_meta(payload: bytes | None):
    """Parse metadata from a payload.  Real codecs (PIL/libjpeg) are not
    available in this container; only the FAKE header is supported —
    plug a real decoder here when the environment provides one."""
    if payload is None:
        return None
    if not payload.startswith(FAKE_MAGIC):
        raise NotImplementedError(
            "real image decoding requires an image library not present in "
            "this environment; payload is not a FAKEIMG1 blob"
        )
    w, h, c = struct.unpack_from("<III", payload, len(FAKE_MAGIC))
    return (w, h, c, "fake", len(payload))


def with_image_meta(df: DataFrame, media_col: str = "media",
                    out_col: str = "media_meta") -> DataFrame:
    """Attach the metadata struct via mapInPandas (Arrow batches)."""
    out_fields = df.schema.fields + [StructField(out_col, IMAGE_META_SCHEMA)]
    schema = StructType(out_fields)

    def gen(batches):
        for pdf in batches:
            metas = []
            for b in pdf[media_col]:
                m = decode_image_meta(bytes(b) if b is not None else None)
                metas.append(
                    None if m is None else
                    {"width": m[0], "height": m[1], "channels": m[2],
                     "format": m[3], "size_bytes": m[4]}
                )
            pdf = pdf.copy()
            pdf[out_col] = metas
            yield pdf

    return df.mapInPandas(gen, schema=schema)


def image_mean_brightness(df: DataFrame, media_col: str = "media",
                          out_col: str = "brightness") -> DataFrame:
    """Feature extraction demo over the fake payload bytes: mean of the
    body bytes / 255.  Shape of a real feature extractor (vectorized
    numpy over Arrow batches)."""
    schema = StructType(df.schema.fields + [StructField(out_col, DoubleType())])

    def gen(batches):
        for pdf in batches:
            vals = []
            for b in pdf[media_col]:
                if b is None:
                    vals.append(None)
                    continue
                body = np.frombuffer(bytes(b), dtype=np.uint8, offset=len(FAKE_MAGIC) + 12)
                vals.append(float(body.mean()) / 255.0 if len(body) else 0.0)
            pdf = pdf.copy()
            pdf[out_col] = vals
            yield pdf

    return df.mapInPandas(gen, schema=schema)


def resize_images(df: DataFrame, target_w: int, target_h: int,
                  media_col: str = "media") -> DataFrame:
    """Resize step: rewrites each payload to the target dimensions.  The
    pixel resample is stubbed (body bytes truncated/tiled to the new
    size budget — a real library would interpolate); header metadata,
    batch shape, and payload-size discipline are the real parts."""
    schema = df.schema

    def gen(batches):
        for pdf in batches:
            out = []
            for b in pdf[media_col]:
                if b is None:
                    out.append(None)
                    continue
                raw = bytes(b)
                if not raw.startswith(FAKE_MAGIC):
                    raise NotImplementedError(
                        "real image resizing requires an image library not "
                        "present in this environment"
                    )
                _, _, c = struct.unpack_from("<III", raw, len(FAKE_MAGIC))
                body = raw[len(FAKE_MAGIC) + 12:]
                n = min(target_w * target_h * c, 4096)
                reps = -(-n // max(len(body), 1))
                new_body = (body * reps)[:n] if body else b"\x00" * n
                out.append(FAKE_MAGIC + struct.pack("<III", target_w, target_h, c)
                           + new_body)
            pdf = pdf.copy()
            pdf[media_col] = out
            yield pdf

    return df.mapInPandas(gen, schema=schema)


AUDIO_META_SCHEMA = StructType([
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("duration_s", DoubleType()),
])

FAKE_AUDIO_MAGIC = b"FAKEAUD1"


def make_fake_audio(sample_rate: int, n_samples: int, seed: int = 0) -> bytes:
    head = FAKE_AUDIO_MAGIC + struct.pack("<IQ", sample_rate, n_samples)
    rng = np.random.RandomState(seed)
    return head + rng.randint(-128, 128, min(n_samples, 4096),
                              dtype=np.int8).tobytes()


def with_audio_meta(df: DataFrame, media_col: str = "audio",
                    out_col: str = "audio_meta") -> DataFrame:
    """Audio metadata decode (same contract as with_image_meta; only the
    engine's FAKE header is decodable in this container)."""
    schema = StructType(df.schema.fields + [StructField(out_col, AUDIO_META_SCHEMA)])

    def gen(batches):
        for pdf in batches:
            metas = []
            for b in pdf[media_col]:
                if b is None:
                    metas.append(None)
                    continue
                raw = bytes(b)
                if not raw.startswith(FAKE_AUDIO_MAGIC):
                    raise NotImplementedError(
                        "real audio decoding requires an audio library not "
                        "present in this environment"
                    )
                sr, n = struct.unpack_from("<IQ", raw, len(FAKE_AUDIO_MAGIC))
                metas.append({"sample_rate": sr, "n_samples": n,
                              "duration_s": n / sr if sr else None})
            pdf = pdf.copy()
            pdf[out_col] = metas
            yield pdf

    return df.mapInPandas(gen, schema=schema)


def sample_video_frames(df: DataFrame, media_col: str = "media",
                        every_n: int = 10, id_col: str = "media_id") -> DataFrame:
    """Frame-sampling fan-out: one output row per sampled frame index.
    The decode itself is stubbed (frame payload = slice of the body);
    the row-explosion plumbing is the real part."""
    schema = StructType([
        StructField(id_col, LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame", BinaryType()),
    ])

    def gen(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf[id_col], pdf[media_col]):
                if b is None:
                    continue
                body = bytes(b)[len(FAKE_MAGIC) + 12:]
                n_frames = max(len(body) // 256, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(body[fi * 256:(fi + 1) * 256])
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "frame_index": pd.Series(idxs, dtype="int32"),
                                "frame": pd.Series(frames, dtype=object)})

    return df.mapInPandas(gen, schema=schema)


# magic-byte signatures for native modality sniffing: (modality,
# [(offset_1based, fragment), ...]) — ALL fragments must match, rows
# dispatch in order (container SUB-types before the generic container,
# so WAV/AVI/WebP don't conflate into one 'riff' class and an ISO-BMFF
# video never routes to an audio codec).  Public file-format magic
# numbers + the engine's own FAKE headers.
MAGIC_SIGNATURES = [
    ("png", [(1, b"\x89PNG\r\n\x1a\n")]),
    ("jpeg", [(1, b"\xff\xd8\xff")]),
    ("gif", [(1, b"GIF8")]),
    ("wav", [(1, b"RIFF"), (9, b"WAVE")]),   # RIFF sub-type at byte 9
    ("avi", [(1, b"RIFF"), (9, b"AVI ")]),
    ("webp", [(1, b"RIFF"), (9, b"WEBP")]),
    ("riff", [(1, b"RIFF")]),                # any other RIFF payload
    ("mp4", [(5, b"ftyp")]),                 # ISO-BMFF (mp4/mov/heic)
    ("ogg", [(1, b"OggS")]),
    ("flac", [(1, b"fLaC")]),
    ("mp3", [(1, b"ID3")]),                  # ID3v2-tagged stream
    ("mp3", [(1, b"\xff\xfb")]),             # bare MPEG-1 L3 sync words
    ("mp3", [(1, b"\xff\xf3")]),
    ("mp3", [(1, b"\xff\xf2")]),
    ("fake_image", [(1, FAKE_MAGIC)]),
    ("fake_audio", [(1, FAKE_AUDIO_MAGIC)]),
]


def sniff_modality(col):
    """Native magic-byte modality classification of a binary payload —
    a CASE over hex substrings at published offsets, NO decode, NO
    Python: the triage pass a 100-TB media lake runs before spending
    codec time.  RIFF containers dispatch on their byte-9 sub-type
    (WAV audio vs AVI video vs WebP image), ISO-BMFF on the ``ftyp``
    box at byte 5.  NULL payloads classify as 'missing', unrecognized
    prefixes as 'unknown'."""
    out = F.when(col.isNull(), F.lit("missing"))
    for name, frags in MAGIC_SIGNATURES:
        cond = None
        for off, sig in frags:
            c = F.hex(F.substring(col, off, len(sig))) == sig.hex().upper()
            cond = c if cond is None else (cond & c)
        out = out.when(cond, F.lit(name))
    return out.otherwise(F.lit("unknown"))


def media_manifest(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Per-modality manifest of a media column: row count and payload
    byte statistics, grouped by the sniffed modality.  Everything is
    native substring/length arithmetic — one narrow scan, one hash
    aggregation, zero codec work — so corrupt or mislabeled blobs are
    quarantined BEFORE any expensive decode stage launches."""
    m = df.select(
        sniff_modality(F.col(media_col)).alias("modality"),
        F.coalesce(F.length(F.col(media_col)),
                   F.lit(0)).cast("long").alias("nb"))
    return (m.groupBy("modality")
            .agg(F.count("*").alias("n"),
                 F.sum("nb").cast("long").alias("total_bytes"),
                 F.min("nb").alias("min_bytes"),
                 F.max("nb").alias("max_bytes"),
                 F.round(F.avg("nb"), 6).alias("avg_bytes")))


# ---------------------------------------------------------------------
# Perceptual near-duplicate hashing (dHash + Hamming LSH)
# ---------------------------------------------------------------------

DHASH_HEADER_BYTES = len(FAKE_MAGIC) + 12  # magic + 3x uint32


def media_dhash(col, header_bytes: int = DHASH_HEADER_BYTES,
                grid_rows: int = 8, grid_cols: int = 9):
    """64-bit difference hash (dHash) over a media payload's body
    bytes — the perceptual member of the media-dedup family: exact
    content-hash dedup (`media_dedup(method='exact')`) only catches
    byte-identical refetches, while re-encoded / lightly-edited copies
    need a locality-sensitive fingerprint whose Hamming distance
    tracks visual similarity (the published image-dedup stage:
    aHash/dHash/pHash + Hamming banding).

    Honest-without-codecs contract: with no image library in the
    container the hash is computed over the RAW BODY BYTES as a 1-D
    signal — ``grid_rows x grid_cols`` positions sampled evenly
    (``pos_g = g * body_len // 72``), bit ``r*8+c`` set iff
    ``byte[r,c] > byte[r,c+1]`` (the classic 9->8 adjacent
    comparison per row).  Plug a real decoder in front (decode ->
    luma -> resize to 9x8) and this same comparison tail applies
    unchanged to real pixels.

    ENTIRELY native (substring/hex/conv/comparison chains — no UDF,
    no Arrow boundary): the hash runs inside the scan stage, so a
    100-TB media lake is fingerprinted in the same pass that sniffs
    and manifests it.  NULL payloads hash to NULL.  Bit 63 uses the
    signed-long min literal (two's complement; band extraction masks
    after an arithmetic shift, identical in Spark and the DuckDB
    oracle)."""
    from .textstats import let

    n = grid_rows * grid_cols
    L = (F.length(col) - header_bytes).cast("long")

    def byte_at(g: int):
        # floor(g*L/n) via double divide + truncation (exact: values
        # < 2^20, far inside double precision); substring is 1-based
        pos = ((F.lit(g).cast("long") * L) / F.lit(n)).cast("long") \
            + F.lit(header_bytes + 1)
        return F.conv(F.hex(F.substring(col, pos.cast("int"), F.lit(1))),
                      16, 10).cast("long")

    def fold(arr):
        # let-bound sample array: each of the 72 substring extractions
        # evaluates ONCE even though interior grid columns feed two
        # comparisons (CollapseProject would otherwise inline the
        # extraction tree into both)
        h = F.lit(0).cast("long")
        b = 0
        for r in range(grid_rows):
            for c in range(grid_cols - 1):
                g = r * grid_cols + c
                bit = (F.element_at(arr, g + 1)
                       > F.element_at(arr, g + 2))
                term = F.lit(-(1 << 63)) if b == 63 \
                    else F.lit(1 << b).cast("long")
                h = h + F.when(bit, term).otherwise(
                    F.lit(0).cast("long"))
                b += 1
        return h

    h = let(F.array(*[byte_at(g) for g in range(n)]), fold)
    return F.when(col.isNull(), F.lit(None).cast("long")).otherwise(h)


def media_neardup_pairs(df: DataFrame, media_col: str = "media",
                        id_col: str = "doc_id", max_hamming: int = 6,
                        bands: int = 8) -> DataFrame:
    """Perceptual near-duplicate candidate pairs: (id_a, id_b,
    hamming) for payload pairs whose dHash Hamming distance is at
    most ``max_hamming`` — the simhash/LSH banding recipe applied to
    the 64-bit dHash: split into ``bands`` contiguous bit bands,
    equi-join on (band index, band value), verify with
    ``bit_count(xor)``.

    Pigeonhole guarantee: with ``max_hamming < bands`` a qualifying
    pair differs in fewer blocks than there are blocks, so at least
    ``bands - max_hamming`` blocks are IDENTICAL — the join keys on
    CONCATENATIONS of that many blocks (Manku et al., WWW 2007 block
    combinations) and still has exact recall, never a probabilistic
    miss (the reason the defaults are 6 and 8).

    Distributed shape: one narrow pass computes each payload's hash
    (the table explode replicates the 8-byte hash, never the
    payload), the join shuffles (table, concatenated-block) keys —
    C(bands, bands-max_hamming) tables whose key space is
    ``2^(64*(bands-max_hamming)/bands)`` per table (the defaults give
    28 tables of 16-bit keys: 1.8M distinct join keys, vs the 2048 a
    single-band key space would allow) — and the verify is native
    bit arithmetic on the carried hashes — the corpus' media bytes
    are read exactly once and never shuffled.  Output is row-level
    pairs, inherently QUADRATIC per duplicate group — for
    deduplication use `media_dedup(method='dhash')`, which runs this
    join over distinct hashes only."""
    if not 64 % bands == 0:
        raise ValueError(f"bands must divide 64, got {bands}")
    if max_hamming >= bands:
        import warnings
        warnings.warn(
            f"max_hamming={max_hamming} >= bands={bands}: the banded "
            "join loses the pigeonhole recall guarantee (pairs at "
            f"distance >= {bands} may share no band)")
    h = (df.select(F.col(id_col), media_dhash(F.col(media_col))
                   .alias("_dh"))
         .filter(F.col("_dh").isNotNull()))
    return _hamming_banded_pairs(h, id_col, "_dh", max_hamming, bands)


_MAX_KEY_TABLES = 256  # C(bands, key_blocks) replication bound


def _capped_key_blocks(bands: int, max_hamming: int) -> int:
    """The widest exact-recall key subject to the replication bound:
    start at ``bands - max_hamming`` (floor 1) and walk DOWN until
    ``C(bands, key_blocks) <= _MAX_KEY_TABLES``.  Any ``key_blocks <=
    bands - max_hamming`` keeps pigeonhole recall exact (fewer blocks
    per key = fewer key bits = more candidates to verify, never a
    missed pair), and ``key_blocks=1`` gives ``C = bands`` tables, so
    the walk always terminates under the bound.  The cap exists
    because mid-range combos explode (bands=16 / max_hamming=4 would
    otherwise build C(16,12)=1820 tables — 1820x replication and a
    driver loop over millions of Column structs; bands=32 worse);
    the defaults (bands=8, max_hamming=2 -> key_blocks=6, C(8,6)=28)
    are untouched."""
    from math import comb

    key_blocks = max(1, bands - max_hamming)
    while key_blocks > 1 and comb(bands, key_blocks) > _MAX_KEY_TABLES:
        key_blocks -= 1
    return key_blocks


def _hamming_candidates(h: DataFrame, id_col: str, hash_col: str,
                        bands: int, key_blocks: int) -> DataFrame:
    """Block-combination candidate join (Manku et al., WWW 2007) over
    an (id, 64-bit hash) frame: the hash splits into ``bands``
    contiguous blocks of ``64/bands`` bits, and each row replicates
    into ``C(bands, key_blocks)`` tables, each keyed on the
    CONCATENATION of a distinct ``key_blocks``-subset of blocks.  A
    pair sharing any ``key_blocks`` identical blocks collides in the
    table keyed on that subset, so recall is exact for Hamming
    distance ``<= bands - key_blocks`` (pigeonhole: at most that many
    differing bits can spoil at most that many blocks).

    The point of ``key_blocks > 1`` is JOIN-KEY CARDINALITY: a
    single-block key space is ``bands * 2^(64/bands)`` distinct
    values (2048 at the default 8 bands — a structural collision
    floor that goes quadratic at web-scale distinct-hash counts),
    while each extra block in the key multiplies it by
    ``2^(64/bands)`` at the price of ``C(bands, key_blocks)``-fold
    replication of the 16-byte (id, hash) rows — never the payloads.

    Returns candidate pairs (id_a, id_b, _ha, _hb), id_a < id_b, NOT
    yet distance-verified and possibly multi-table duplicated —
    `_hamming_banded_pairs` is the verified public tail; this split
    exists so tests can pin the candidate-count reduction."""
    from itertools import combinations

    width = 64 // bands
    mask = F.lit((1 << width) - 1).cast("long")

    def block(i: int):
        return F.shiftright(F.col(hash_col), i * width).bitwiseAND(mask)

    entries = []
    for t, combo in enumerate(combinations(range(bands), key_blocks)):
        # disjoint shifted ranges, so bitwise OR == concatenation (and
        # never overflows — ANSI-safe, unlike `+` at the 64-bit edge)
        key = F.lit(0).cast("long")
        for j, c in enumerate(combo):
            key = key.bitwiseOR(F.shiftleft(block(c), j * width))
        entries.append(F.struct(F.lit(t).alias("band"),
                                key.alias("val")))
    banded = h.select(
        id_col, hash_col,
        F.explode(F.array(*entries)).alias("bv")
    ).select(id_col, hash_col, F.col("bv.band").alias("_band"),
             F.col("bv.val").alias("_val"))
    a = banded.select(F.col(id_col).alias("id_a"),
                      F.col(hash_col).alias("_ha"), "_band", "_val")
    b = banded.select(F.col(id_col).alias("id_b"),
                      F.col(hash_col).alias("_hb"), "_band", "_val")
    return (a.join(b, on=["_band", "_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "_ha", "_hb"))


def _hamming_banded_pairs(h: DataFrame, id_col: str, hash_col: str,
                          max_hamming: int, bands: int) -> DataFrame:
    """Verified Hamming join over an (id, 64-bit hash) frame — the
    shared tail of `media_neardup_pairs` (row granularity) and
    `media_dedup(method='dhash')` (distinct-hash granularity).
    Candidates come from `_hamming_candidates` with the widest key
    that preserves exact recall (``key_blocks = bands -
    max_hamming``, floor 1 — the floor is the degraded
    probabilistic regime `media_neardup_pairs` already warns about
    when ``max_hamming >= bands``), SUBJECT to a replication bound:
    ``C(bands, key_blocks)`` tables is unbounded for mid-range
    ``key_blocks`` (bands=16 / max_hamming=4 would mean
    C(16,12)=1820x row replication, and bands=32 combos build
    millions of Column structs in the driver loop), so ``key_blocks``
    walks DOWN until the table count is at most 256 — any
    ``key_blocks <= bands - max_hamming`` keeps recall exact
    (pigeonhole still holds with room to spare); fewer blocks per
    key means fewer key bits and more candidates to verify, never a
    missed pair.  ``key_blocks=1`` (``C = bands`` tables) always
    satisfies the bound, so the walk terminates; the defaults
    (bands=8, max_hamming=2 -> key_blocks=6, C(8,6)=28 tables) are
    untouched."""
    key_blocks = _capped_key_blocks(bands, int(max_hamming))
    return (_hamming_candidates(h, id_col, hash_col, bands, key_blocks)
            .select("id_a", "id_b",
                    F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
                    .alias("hamming"))
            .filter(F.col("hamming") <= int(max_hamming))
            .dropDuplicates(["id_a", "id_b"]))


def media_dedup(df: DataFrame, media_col: str = "media",
                id_col: str = "doc_id", method: str = "exact",
                max_hamming: int = 6, bands: int = 8,
                max_iter: int = 10) -> DataFrame:
    """Media deduplication, survivor-rows contract (the
    `cluster_dedup` shape): keep one representative per duplicate
    group, pass everything else through.

    * ``method='exact'`` — byte-identical refetch removal: group on
      ``md5(payload)``, keep the minimum id (one hash aggregation +
      one anti join; the dominant duplicate class in crawled media).
      NULL payloads pass through (md5(NULL) is NULL — without the
      isNotNull guard every media-less row would collapse into one
      phantom duplicate group);
    * ``method='dhash'`` — PERCEPTUAL: the Hamming join and the
      connected components run over DISTINCT hashes (each represented
      by its minimum row id), never over rows — a duplicate group of
      a million refetches contributes ONE node, so the quadratic
      banded join is bounded by the number of distinct fingerprints,
      not corpus size (`media_neardup_pairs`, which emits row-level
      pairs, is inherently quadratic per duplicate group — use it for
      inspection, this for dedup).  Rows then map hash -> component
      minimum; chains of lightly-edited copies collapse to one keeper
      even when the chain's endpoints exceed ``max_hamming``.  NULL
      payloads pass through (no fingerprint, no duplicate claim).

    Ids are assumed unique per row.  Run 'exact' first at scale: it
    needs no pair join and typically removes most volume; 'dhash'
    then works the smaller residue."""
    if method == "exact":
        nn = (df.filter(F.col(media_col).isNotNull())
              .select(F.col(id_col), F.md5(F.col(media_col))
                      .alias("_mh")))
        keep = nn.groupBy("_mh").agg(F.min(id_col).alias("_keep"))
        drop = (nn.join(keep, on="_mh")
                .filter(F.col(id_col) != F.col("_keep"))
                .select(id_col))
        return df.join(drop, on=id_col, how="left_anti")
    if method == "dhash":
        from .dedup import connected_components

        hdf = (df.select(F.col(id_col),
                         media_dhash(F.col(media_col)).alias("_dh"))
               .filter(F.col("_dh").isNotNull())
               # decode-once (guide §8): the (id, 64-bit hash) proxy
               # is ~16 bytes/row; without this barrier the frame is
               # re-derived — payload scan included — by the groups
               # branch, the CC edge build AND the drop join (the
               # media payload source is opaque to Spark's subtree
               # reuse).  Lazy: materializes in the first consuming
               # job, plan already truncated.
               .transform(plan_barrier))
        groups = hdf.groupBy("_dh").agg(F.min(id_col).alias("_hrep"))
        reps = groups.select(F.col("_hrep").alias(id_col), "_dh")
        pairs = _hamming_banded_pairs(reps, id_col, "_dh",
                                      max_hamming, bands)
        comp = connected_components(pairs, src="id_a", dst="id_b",
                                    max_iter=max_iter)
        # hash -> the perceptual cluster's global minimum id (the CC
        # label is the min rep id; reps are per-hash min ids)
        lab = (groups.join(comp, groups["_hrep"] == comp["node"],
                           "left")
               .select("_dh", F.coalesce("component", "_hrep")
                       .alias("_keep")))
        drop = (hdf.join(lab, on="_dh")
                .filter(F.col(id_col) != F.col("_keep"))
                .select(id_col))
        return df.join(drop, on=id_col, how="left_anti")
    raise ValueError(f"unknown media_dedup method {method!r} "
                     "(expected 'exact' or 'dhash')")
