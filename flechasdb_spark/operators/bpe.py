"""Byte-pair-encoding tokenizer: train + apply (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — the
classic word-internal merge algorithm every modern LLM tokenizer
descends from).

Reference anchor: flechasdb has no tokenizer (vector DB); this extends
the repo's tokenizer story (`text.build_vocab` word-level ids,
`text.bpe_ish_tokens` GPT-2-style pre-tokenization,
`packing.sequence_pack`) with REAL subword training.

Scale design (100 TB): the corpus never reaches the driver and never
meets Python row-at-a-time.

- TRAIN: the corpus collapses to an O(V) (word, count) table with one
  token-grain partial-agg pass; only that table — capped at
  ``max_words`` rows by (count desc, word) — collects to the driver,
  where the merge loop runs over word COUNTS (cost independent of
  corpus size; the same sample-to-driver pattern as k-means training
  in operators/build.py).
- ENCODE: Python applies merges once per DISTINCT word (an Arrow
  pandas_udf over the O(V) distinct-word table with the merge ranks
  broadcast), and the corpus-sized work is a plain token equi-join
  against that encoded vocabulary — Catalyst-side, AQE-broadcast while
  the vocabulary is small.

Determinism: merge selection ties break on the lexicographically
smallest pair; encode is the standard lowest-rank-first greedy loop;
both are pure functions of the (word, count) table, so two engines
training on the same counts produce identical merge lists.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

from flechasdb_spark.operators.text import tokens

__all__ = ["bpe_train", "bpe_apply_word", "bpe_encode", "END_OF_WORD"]

END_OF_WORD = "</w>"


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict:
    counts: dict[tuple[str, str], int] = {}
    for sym, c in vocab.items():
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            counts[p] = counts.get(p, 0) + c
    return counts


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    a, b = pair
    merged = a + b
    out: dict[tuple[str, ...], int] = {}
    for sym, c in vocab.items():
        new = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                new.append(merged)
                i += 2
            else:
                new.append(sym[i])
                i += 1
        out[tuple(new)] = out.get(tuple(new), 0) + c
    return out


def bpe_train(
    df: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    max_words: int = 50_000,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Words are the whitespace ``tokens()`` (lowercased), each split
    into characters plus the classic ``</w>`` end-of-word marker so
    merges cannot cross word boundaries. The driver sees ONLY the
    (word, count) table (top ``max_words`` by count desc then word —
    deterministic cap), never the corpus. Merging stops early when no
    pair reaches ``min_pair_count``.

    Returns the ordered merge list [(left, right), ...] — order IS the
    rank used at encode time.
    """
    wc = (
        df.select(F.explode(tokens(text_col)).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.col("__c").desc(), "__w")
        .limit(int(max_words))
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in wc:
        sym = tuple(list(r["__w"]) + [END_OF_WORD])
        vocab[sym] = vocab.get(sym, 0) + int(r["__c"])
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        counts = _pair_counts(vocab)
        if not counts:
            break
        # deterministic argmax: highest count, then smallest pair
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < int(min_pair_count):
            break
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
    return merges


def bpe_apply_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word with the trained merges: repeatedly apply the
    lowest-ranked applicable merge (the standard greedy loop every BPE
    implementation uses). Pure function — shared by the executor UDF
    and the tests."""
    sym = list(word) + [END_OF_WORD]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode every document into BPE subword tokens.

    Python runs once per DISTINCT word (Arrow-batched pandas_udf over
    the O(V) distinct-word table, merge ranks broadcast via closure);
    the corpus-sized step is a token equi-join against that encoded
    vocabulary plus one per-doc reassembly aggregation — no
    row-at-a-time Python anywhere near the corpus.

    Returns (id_col, pieces array<string>, n_pieces) with pieces in
    document order (``</w>``-terminated words, concatenation
    restores the word stream exactly).
    """
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def encode_word(words: pd.Series) -> pd.Series:
        return words.map(lambda w: bpe_apply_word(w, ranks))

    toks = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("__p", "__w")
    )
    vocab = toks.select("__w").distinct().select(
        "__w", encode_word(F.col("__w")).alias("__pieces")
    )
    joined = toks.join(vocab, "__w")
    per_doc = joined.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__p", "__pieces"))
                ),
                lambda x: x["__pieces"],
            )
        ).alias("pieces")
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                "pieces", F.array().cast("array<string>")
            ).alias("pieces"),
            F.coalesce(F.size("pieces"), F.lit(0))
            .cast("long")
            .alias("n_pieces"),
        )
    )
