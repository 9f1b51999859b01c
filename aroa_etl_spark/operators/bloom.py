"""Deterministic Bloom-filter semi-join pruning.

At 100 TB the cheapest join is the one whose probe side never shuffles:
when the build side's KEY SET compresses into a few KB of bits, ship the
bits, not the keys. ``bloom_build`` folds the build keys into an m-bit
Bloom filter (d md5-family hash functions, 32-bit words, one
map-side-combinable ``bit_or`` aggregation); ``bloom_prune`` broadcasts
the single-row word array and keeps only probe rows whose d bits are all
set — a superset of the true semi-join (false positives ~ (1-e^{-dn/m})^d,
never false negatives), to be finished by the real join if exactness is
required. This is the engine-level version of what Spark's runtime row
group / bloom pushdown does, made explicit, cross-stage, and portable
(persist the word array and reuse it across jobs).

The md5 hash family makes the filter DETERMINISTIC: the same build keys
give the same bits on any engine, so pruning decisions (and the catalog
oracle) are bit-reproducible. Words are 32-bit (stored in BIGINT) so
``1 << bit`` never touches the sign bit on either engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_prune"]

_WORD = 32


def _one_shl(bit: Column) -> Column:
    """``1 << bit`` for a COLUMN bit count (F.shiftleft wants a literal):
    2^bit via pow — exact in doubles for bit in [0, 32)."""
    return F.pow(F.lit(2.0), bit.cast("double")).cast("long")


def _bit_pos(c: Column, j: int, m_bits: int) -> Column:
    """j-th hash position in [0, m_bits): md5('bf<j>:' || key)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"bf{j}:"), c.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return h % F.lit(m_bits)


def bloom_build(df: DataFrame, col: str, m_bits: int = 1 << 15, d: int = 4) -> DataFrame:
    """Single-row frame ``(words: array<long>)`` — the m-bit filter as
    m/32 little-endian 32-bit words. One explode (d rows per key) + one
    bounded ``bit_or`` groupBy + one array assembly; NULL keys ignored."""
    if m_bits % _WORD:
        raise ValueError(f"m_bits must be a multiple of {_WORD}")
    keys = df.select(F.col(col).alias("k")).filter(F.col("k").isNotNull())
    pos = keys.select(
        F.explode(
            F.array(*[_bit_pos(F.col("k"), j, m_bits) for j in range(d)])
        ).alias("pos")
    )
    words = pos.groupBy((F.col("pos") / _WORD).cast("long").alias("widx")).agg(
        F.bit_or(_one_shl((F.col("pos") % _WORD))).alias("w")
    )
    spark = df.sparkSession
    dense = (
        spark.range(m_bits // _WORD)
        .select(F.col("id").alias("widx"))
        .join(words, "widx", "left")
        .select("widx", F.coalesce("w", F.lit(0)).alias("w"))
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("widx", "w"))), lambda s: s["w"]
        ).alias("words")
    )


def bloom_prune(
    probe: DataFrame, col: str, bloom: DataFrame, m_bits: int = 1 << 15, d: int = 4
) -> DataFrame:
    """Probe rows whose key MIGHT be in the build set (all d bits set).
    The 1-row word array broadcasts; membership is d array lookups +
    bit tests per row — no shuffle of the probe side at all."""
    c = F.col(col)
    cond = c.isNotNull()
    for j in range(d):
        pos = _bit_pos(c, j, m_bits)
        word = F.element_at(F.col("__bloom_words"), (pos / _WORD).cast("int") + 1)
        bit = _one_shl(pos % _WORD)
        cond = cond & (word.bitwiseAND(bit) != 0)
    return (
        probe.crossJoin(F.broadcast(bloom.withColumnRenamed("words", "__bloom_words")))
        .filter(cond)
        .drop("__bloom_words")
    )
