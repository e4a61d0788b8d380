"""WordPiece tokenization as an Arrow-batched pandas UDF — the
subword step a real training pipeline runs between text curation and
sequence packing (Wu et al. 2016; the greedy longest-match-first
algorithm used by BERT vocabularies).

Greedy longest-match is inherently iterative per word (each piece
depends on where the previous one ended), so it is NOT expressible as
Catalyst column expressions — this is exactly the "Python when
built-ins genuinely can't" case, and it takes the fast Python path:
a scalar ``pandas_udf`` (Arrow batch transfer, ~10-100x a row-at-a-
time UDF), with the vocabulary grouped by piece length ONCE per
executor (module-level closure, broadcast-sized) rather than per row.

The registry entry is rows-only by design (same class as the
t-test/Wilcoxon UDAF: non-SQL semantics); correctness is pinned by
the pure-Python reference tests in tests/test_tokenizer.py instead.

At 100 TB: embarrassingly row-parallel, zero shuffle; vocab memory is
O(|vocab|) per executor; batch size follows
spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

UNK = "[UNK]"
CONT = "##"

# A vocabulary fitted to the synthetic corpus' word shapes plus
# single-character fallbacks — stands in for a learned BERT vocab.
DEFAULT_VOCAB = (
    ["spark", "join", "wind", "table", "scan", "filt", "group", "stream",
     "custom", "batch", "column", "value", "quer", "merge", "sort",
     "##ow", "##er", "##y", "##s", "##om", "##ch"]
    + [chr(c) for c in range(ord("a"), ord("z") + 1)]
    + [f"##{chr(c)}" for c in range(ord("a"), ord("z") + 1)]
    + [str(d) for d in range(10)]
    + [f"##{d}" for d in range(10)]
)


def wordpiece_word(word: str, starts: dict[int, set], conts: dict[int, set], max_len: int) -> list[str]:
    """Greedy longest-match-first split of one word; [UNK] when stuck."""
    pieces: list[str] = []
    pos = 0
    n = len(word)
    while pos < n:
        table = starts if pos == 0 else conts
        match = None
        for ln in range(min(max_len, n - pos), 0, -1):
            cand = word[pos : pos + ln]
            if cand in table.get(ln, ()):
                match = cand
                break
        if match is None:
            return [UNK]
        pieces.append(match if pos == 0 else CONT + match)
        pos += len(match)
    return pieces


def _index_vocab(vocab: Iterable[str]) -> tuple[dict[int, set], dict[int, set], int]:
    starts: dict[int, set] = {}
    conts: dict[int, set] = {}
    for v in vocab:
        if v.startswith(CONT):
            body = v[len(CONT):]
            conts.setdefault(len(body), set()).add(body)
        else:
            starts.setdefault(len(v), set()).add(v)
    max_len = max(list(starts) + list(conts) + [1])
    return starts, conts, max_len


def wordpiece_udf(vocab: Iterable[str] | None = None) -> Column:
    """Build a pandas UDF ``string -> array<string>`` tokenizing full
    text: whitespace/punct pre-split (the same token class as
    ``tokens_expr``), then greedy WordPiece per word."""
    import re

    starts, conts, max_len = _index_vocab(vocab or DEFAULT_VOCAB)
    word_re = re.compile(r"[a-z0-9]+")

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def tokenize(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            pieces: list[str] = []
            for w in word_re.findall(t.lower()):
                pieces.extend(wordpiece_word(w, starts, conts, max_len))
            out.append(pieces)
        return pd.Series(out)

    return tokenize


def wordpiece_tokenize(
    df: DataFrame,
    text_col: str = "text",
    vocab: Iterable[str] | None = None,
) -> DataFrame:
    """Add ``pieces`` (array<string>), ``n_pieces`` and ``n_unk``
    columns. Everything after the UDF is codegen'd column math."""
    tok = wordpiece_udf(vocab)
    return (
        df.withColumn("pieces", tok(F.col(text_col)))
        .withColumn("n_pieces", F.size("pieces").cast("bigint"))
        .withColumn(
            "n_unk",
            F.size(F.filter("pieces", lambda p: p == UNK)).cast("bigint"),
        )
    )
