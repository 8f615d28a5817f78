"""Byte-pair-encoding tokenizer training + corpus segmentation.

The reference pipeline has no tokenizer (its corpus is a 10-row HTML
table); this module is part of the north-star training-data surface
(SURVEY.md section 8): a pretraining pipeline must TRAIN the tokenizer
on the corpus it just cleaned, then encode that corpus with it.

Scale design:

  * ``bpe_train`` touches the corpus ONCE: a map-side-combined
    groupBy(word) builds the word-frequency table, and every one of the
    n_merges Lloyd-style iterations after that runs over the
    VOCAB-sized table (|distinct words| rows, millions at 100 TB --
    never corpus-sized). Per iteration: one explode of adjacent symbol
    pairs weighted by word count, one aggregate, one bounded
    TakeOrdered(1) for the argmax pair, and a pure-expression fold that
    applies the merge to each word's symbol array. The table is
    localCheckpoint'd per iteration so the plan does not nest n_merges
    folds.
  * ``bpe_segment`` encodes a corpus against a trained merge list: the
    Python merge loop (the classic rank-greedy algorithm) runs only on
    DISTINCT words via an Arrow-batched pandas iterator, and the
    corpus-sized side is a broadcast-friendly equi-join of word ->
    segmentation. Python cost is vocab-sized; corpus cost is one
    explode + one join + one per-doc reassembly.

Determinism: merge argmax ties break on (count desc, left asc,
right asc); word splitting is the ws_tokens twin; no RNG anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.xhash import ws_tokens

_WORD_END = "</w>"

#: The shipped tokenizer artifact for the gated serving entry (z123):
#: the exact output of ``bpe_train(documents@sf0.001, n_merges=16)``,
#: baked as a literal the way a production pipeline ships a tokenizer
#: trained once and applied to every later corpus. Training-order merge
#: lists are producer-before-consumer (a merge's left/right symbols can
#: only be produced by EARLIER merges), which is what makes the
#: sequential-replace oracle below equivalent to the rank-greedy
#: encoder (`_segment_word`) -- see bpe_tokenize_oracle_sql.
SHIPPED_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("o", "r"),
    ("t", "</w>"), ("er", "</w>"), ("o", "w"), ("ow", "</w>"),
    ("l", "u"), ("i", "n"), ("y", "</w>"), ("a", "r"),
    ("p", "ar"), ("g", "</w>"), ("a", "s"), ("h", "</w>"),
]


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


def bpe_tokenize_oracle_sql(
    merges: list[tuple[str, str]],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle recomputing ``bpe_segment(df, merges)``'s
    ``n_bpe_tokens`` with pure string algebra -- the z126/z127
    shared-mapping-table pattern applied to a tokenizer.

    Encoding: each word renders as its symbol list joined with DOUBLE
    spaces and single-space rims (`' a  b  </w> '`); merge (l, r) is one
    global ``replace(' l  r ' -> ' lr ')``. The double-space separator
    makes adjacent matches share NO characters, so one left-to-right
    non-overlapping replace pass merges exactly the occurrences the
    Spark `_apply_merge` leftmost-greedy fold merges (single-space
    joins would skip every second occurrence of a same-symbol run --
    the ' a a a ' trap). Applying merges in TRAINING order, each
    exhaustively, equals the rank-greedy encode because training order
    is producer-before-consumer: no later merge can create an instance
    of an earlier pair (a merge only creates adjacencies involving its
    new, strictly-later symbol). Token count falls out of the space
    arithmetic: a k-symbol rendering carries exactly 2k spaces.
    """
    expr = (
        "' ' || array_to_string(list_append(string_split(word, ''), "
        "'</w>'), '  ') || ' '"
    )
    for left, right in merges:
        pat = _sql_quote(f" {left}  {right} ")
        rep = _sql_quote(f" {left}{right} ")
        expr = f"replace({expr}, '{pat}', '{rep}')"
    return f"""
WITH w AS (
  SELECT {id_col},
         unnest(string_split_regex(trim(lower({text_col})), '\\s+')) AS word
  FROM {table} WHERE length(trim({text_col})) > 0),
seg AS (SELECT {id_col}, {expr} AS s FROM w),
cnt AS (
  SELECT {id_col},
         sum((length(s) - length(replace(s, ' ', ''))) // 2) AS n
  FROM seg GROUP BY {id_col})
SELECT d.{id_col}, coalesce(cnt.n, 0)::INT AS n_bpe_tokens
FROM {table} d LEFT JOIN cnt USING ({id_col})
"""


def _word_freq(df: DataFrame, text_col: str) -> DataFrame:
    toks = F.when(
        F.length(F.trim(F.col(text_col))) == 0,
        F.array().cast("array<string>"),
    ).otherwise(ws_tokens(F.col(text_col)))
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(word: F.Column) -> F.Column:
    """Character symbols + an explicit end-of-word marker (the classic
    Sennrich et al. 2016 formulation, so merges can learn suffixes)."""
    return F.concat(F.split(word, ""), F.array(F.lit(_WORD_END)))


def _apply_merge(arr: F.Column, left: str, right: str) -> F.Column:
    """Leftmost-greedy single-merge pass as a pure fold: append each
    symbol, but when the accumulated tail is `left` and the incoming
    symbol is `right`, replace the tail with the merged symbol."""
    merged = left + right
    return F.aggregate(
        arr,
        F.array().cast("array<string>"),
        lambda out, x: F.when(
            (F.size(out) > 0)
            & (F.element_at(out, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(out, 1, F.size(out) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(out, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 32,
    text_col: str = "text",
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Train BPE merges on the corpus (Sennrich/Haddow/Birch, ACL 2016):
    greedily merge the most frequent adjacent symbol pair n_merges
    times, counting pair occurrences weighted by word frequency.
    Returns the ordered merge list (the tokenizer artifact).

    Stops early when no pair reaches ``min_pair_freq``. Ties on count
    break lexically on (left, right), so the merge list is a pure
    function of the corpus.
    """
    spark = df.sparkSession
    words = (
        _word_freq(df, text_col)
        .select("freq", _initial_symbols(F.col("word")).alias("syms"))
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = words.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_freq:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))
        words = words.select(
            "freq", _apply_merge(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint()
    words.unpersist()
    return merges


def _segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic rank-greedy BPE encode of one word (driver/worker-local
    Python -- only ever applied to DISTINCT words)."""
    syms = list(word) + [_WORD_END]
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        syms[best : best + 2] = [syms[best] + syms[best + 1]]
    return syms


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents with a trained merge list: returns
    ``(id, bpe_tokens array<string>, n_bpe_tokens)`` with tokens in
    document order.

    The Python merge loop runs ONLY over distinct words (mapInPandas,
    Arrow batches over the vocab-sized table); the corpus side is a
    posexplode -> equi-join on the word -> per-doc ordered reassembly.
    Join-side note: the distinct-word table is usually small enough
    that AQE broadcasts it; at extreme vocabularies it degrades to a
    hash join, never a Python pass over the corpus.
    """
    import pandas as pd  # noqa: F401 -- Arrow batch dependency

    ranks = {pair: i for i, pair in enumerate(merges)}
    toks = F.when(
        F.length(F.trim(F.col(text_col))) == 0,
        F.array().cast("array<string>"),
    ).otherwise(ws_tokens(F.col(text_col)))
    pos = df.select(F.col(id_col), F.posexplode(toks).alias("pos", "word"))
    distinct_words = pos.select("word").distinct()

    def seg_batches(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["pieces"] = pdf["word"].map(
                lambda w: _segment_word(w, ranks)
            )
            yield pdf

    segmented = distinct_words.mapInPandas(
        seg_batches, "word string, pieces array<string>"
    )
    enc = pos.join(segmented, "word")
    agg = enc.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("pieces")))
                ),
                lambda s: s["pieces"],
            )
        ).alias("_t"),
        F.sum(F.size("pieces")).alias("_n"),
    )
    return df.select(F.col(id_col)).join(agg, id_col, "left").select(
        id_col,
        F.coalesce(F.col("_t"), F.array().cast("array<string>")).alias(
            "bpe_tokens"
        ),
        F.coalesce(F.col("_n"), F.lit(0)).cast("int").alias("n_bpe_tokens"),
    )
