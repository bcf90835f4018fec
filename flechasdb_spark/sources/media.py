"""Raw media-file ingest via Spark's built-in ``binaryFile`` source —
how a multimodal pipeline actually lands 100 TB of image/audio/video
files into the engine's payload contract (the parquet binary-column
path the decoders already consume is the STORED form; this is the
ingest edge that produces it).

Reference anchor: flechasdb ingests vectors from Protocol Buffers
files on disk (flechasdb-proto, src/io.rs); the analogous Spark-first
move for opaque media is the DataSource V2 ``binaryFile`` reader —
one row per file with the file path, size, and content, scanned in
parallel with files packed into tasks by size
(spark.sql.files.maxPartitionBytes), no driver-side directory walk.

Scale (100 TB): binaryFile never splits a file, so task balance comes
from bin-packing many files per task — millions of small media files
parallelize perfectly; a few giant ones become stragglers and should
be sharded upstream. The format sniff is pure Catalyst over the first
bytes (whole-stage codegen; no Python), ids are content-addressed
(md5 of the bytes — re-ingesting the same file under a new path
dedupes for free downstream), and the output lands directly in the
``attach_payload`` schema so ``decode_image`` / ``decode_audio`` /
``payload_stats`` run unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["read_media_dir", "sniff_format", "payload_projection"]

# the binaryFile source's fixed schema, needed explicitly by the
# STREAMING reader (file stream sources require a user schema)
BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)

# magic-byte prefixes -> declared format, checked in order; the RIFF
# container disambiguates on the form type at offset 9
_MAGIC = [
    ("424D", "image/bmp"),
    ("5036", "image/ppm"),
]


def sniff_format(payload_col: str = "content") -> F.Column:
    """Pure-Catalyst format sniff over the payload's leading bytes.

    Dispatches on the same magic bytes the real decoders check
    (``operators/multimodal.py::_real_decode`` / ``_decode_wav`` /
    ``_decode_avi``), so a payload tagged here is a payload the
    matching decoder will accept or reject for a CONTENT reason, not
    a routing one. Unknown prefixes tag ``application/octet-stream``
    and should be routed to quarantine, not to a decoder.
    """
    c = F.col(payload_col)
    head2 = F.hex(F.substring(c, 1, 2))
    riff = F.hex(F.substring(c, 1, 4)) == "52494646"
    form = F.hex(F.substring(c, 9, 4))
    expr = F.when(riff & (form == "57415645"), F.lit("audio/wav")).when(
        riff & (form == "41564920"), F.lit("video/avi")
    )
    for magic, fmt in _MAGIC:
        expr = expr.when(head2 == magic, F.lit(fmt))
    return expr.otherwise(F.lit("application/octet-stream"))


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Read a directory of raw media files into the payload contract.

    Returns (doc_id, path, payload, media_meta) where ``doc_id`` is
    the content-addressed 60-bit md5 id (same derivation as
    ``assign_vector_ids``'s deterministic mode — byte-identical files
    collide on purpose), ``path`` preserves provenance, and
    ``media_meta`` is the ``struct(n_bytes, format)`` the multimodal
    operators expect, with ``format`` sniffed from magic bytes, never
    trusted from the file extension.

    ``glob`` narrows the listing JVM-side (``pathGlobFilter`` — files
    that don't match are never opened); ``recursive`` walks nested
    directories. Both happen in the source, not in a filter after the
    read, so excluded bytes are never scanned.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return payload_projection(reader.load(path))


def payload_projection(raw: DataFrame) -> DataFrame:
    """Reshape a binaryFile frame (batch or streaming — the projection
    is stateless, so it is legal on an unbounded stream) into the
    payload contract: content-addressed id, provenance path, opaque
    payload, magic-sniffed typed metadata."""
    return raw.select(
        F.conv(F.substring(F.md5("content"), 1, 15), 16, 10)
        .cast("long")
        .alias("doc_id"),
        F.col("path"),
        F.col("content").alias("payload"),
        F.struct(
            F.col("length").cast("long").alias("n_bytes"),
            sniff_format("content").alias("format"),
        ).alias("media_meta"),
    )
