"""Byte-pair-encoding tokenizer training + encoding over a corpus.

The training-data pipeline's tokenizer step (SURVEY's "token counting"
row covers a BPE-ish regex; this is the real trainer). The distributed
shape is the one fast tokenizer trainers actually use: BPE statistics
are a function of the WORD-FREQUENCY table, not the raw corpus — so

* **one distributed pass** builds ``(word, count)`` (explode + hash
  aggregate; the shuffle carries words, never documents),
* the table is **bounded** to the ``top_words`` most frequent words
  (deterministic count-desc/word tie-break) — on web corpora the top
  ~10⁶ word forms carry almost all token mass, so merge quality is
  unaffected while the driver state stays MBs at any corpus size,
* the **merge loop runs driver-side** over that dict (each iteration
  re-counts pairs in ≤ top_words short symbol lists — microseconds;
  running it as Spark jobs would be thousands of shuffles for the same
  arithmetic),
* **encoding** is an Arrow-batched map stage with a per-batch word
  cache (corpora repeat words; each distinct word is merged once per
  batch).

Determinism: ties in pair counts break lexicographically, so the
learned merge list is a pure function of the word-count table — same
merges on any cluster, any partitioning. The initial pair statistics
are SQL-expressible and oracle-checked (r130); the greedy loop and
encode are pinned by unit tests (known-corpus merges, round-trip,
monotone compression, partition invariance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word marker (the classic BPE word-boundary symbol)
EOW = "</w>"

#: hard ceiling on the driver-side vocab collect in :func:`bpe_train`
_MAX_DRIVER_WORDS = 2_000_000


def word_counts(
    df: DataFrame, text_col: str = "text", top_words: int | None = None
) -> DataFrame:
    """Distributed ``(word, count)`` over whitespace-split, lowercased
    text — the sufficient statistic for BPE training. ``top_words``
    bounds the table (count desc, word asc — deterministic)."""
    wc = (
        df.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
                "word"
            )
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )
    if top_words is not None:
        # TakeOrderedAndProject: per-partition partial top-k, no full sort
        wc = wc.orderBy(F.desc("count"), "word").limit(top_words)
    return wc


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_words: int | None = None
) -> DataFrame:
    """Initial adjacent-symbol pair counts (characters + ``</w>``),
    weighted by word frequency — iteration 0 of BPE training, fully
    relational (explode the character positions of each distinct word,
    pair with the next symbol, weight by the word's corpus count).
    This is the SQL-expressible face of the trainer; r130's DuckDB twin
    recomputes it exactly."""
    wc = word_counts(df, text_col, top_words)
    # symbols = chars + EOW; pairs over positions 1..len(symbols)-1
    syms = F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW)))
    pairs = F.expr(
        "transform(sequence(1, size(_syms) - 1), "
        "i -> struct(_syms[i - 1] AS a, _syms[i] AS b))"
    )
    return (
        wc.select("count", syms.alias("_syms"))
        .select("count", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("count").alias("pair_count"))
    )


def _merge_word(symbols: list[str], a: str, b: str) -> list[str]:
    out, i, n = [], 0, len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def bpe_train(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    top_words: int | None = 1_000_000,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list (rank = index). See module docstring for the
    distributed/driver split; stops early when no pair reaches
    ``min_pair_count``."""
    wc = word_counts(df, text_col, top_words)
    # the vocab collect is bounded by top_words when set, but
    # top_words=None (or an absurd value) would materialize the whole
    # distinct-word table on the driver — probe the size distributedly
    # and fail loud instead of OOMing
    if top_words is None or top_words > _MAX_DRIVER_WORDS:
        n_words = wc.count()
        if n_words > _MAX_DRIVER_WORDS:
            raise ValueError(
                f"bpe_train would collect {n_words:,} distinct words "
                f"(> {_MAX_DRIVER_WORDS:,}); pass top_words <= "
                f"{_MAX_DRIVER_WORDS:,}"
            )
    rows = wc.collect()
    # r["count"], not r.count — Row.count is the tuple method
    vocab = {r.word: (list(r.word) + [EOW], int(r["count"])) for r in rows}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.values():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        # max count, ties broken lexicographically — deterministic
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < min_pair_count:
            break
        merges.append(best)
        vocab = {
            w: (_merge_word(syms, *best), n) for w, (syms, n) in vocab.items()
        }
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize every document with a learned merge list: Arrow-batched
    map stage, per-batch word cache (each distinct word in the batch is
    merged once). Appends ``out_col: array<string>``; other columns
    pass through."""
    from collections.abc import Iterator

    import pandas as pd

    ranks = {m: i for i, m in enumerate(merges)}
    from pyspark.sql import types as T

    fields = df.schema.fieldNames()
    # fresh StructType — .add() mutates the DataFrame's own schema object
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc_text(text: str) -> list[str]:
            toks: list[str] = []
            for w in (text or "").lower().split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w, ranks)
                toks.extend(got)
            return toks

        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = [enc_text(t) for t in pdf[text_col]]
            yield pdf[fields + [out_col]]

    return df.mapInPandas(batches, out_schema)
