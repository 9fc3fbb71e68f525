"""BPE tokenizer training + distributed encoding.

The reference has no tokenizer surface (SURVEY.md §2 — its pipeline
moves user records); this extends the LLM-pipeline family: byte-pair
encoding (Sennrich, Haddow & Birch, "Neural Machine Translation of
Rare Words with Subword Units", ACL 2016) is how a training-data
pipeline turns curated text into model-ready token ids, and token
counts gate every mixture/packing decision downstream.

Shape: the PQ-codebook pattern applied to tokenization. TRAINING runs
on a bounded deterministic sample on the driver (the universal
practice — HF `tokenizers`, SentencePiece and GPT-2's original
trainer all train on a corpus slice, because the merge table is a
tiny artifact whose quality saturates long before the corpus does);
ENCODING is one distributed Arrow pass over the full corpus with the
FROZEN merge table, row-local and linear, with a per-batch
distinct-word cache so the Zipf head is encoded once per batch
instead of once per occurrence. Python is unavoidable here and
documented: BPE encoding is an iterative, data-dependent merge loop
that no Column expression can express; the Arrow stage is
vectorized at the batch level and the per-word loop touches each
DISTINCT word once.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@lru_cache(maxsize=1)
def byte_unicode_map() -> dict:
    """The byte-level BPE alphabet: a fixed bijection from the 256
    byte values to printable unicode characters (Radford et al. 2019,
    GPT-2 — the published byte-to-unicode table every byte-level BPE
    uses). Printable ASCII and Latin-1 ranges map to themselves; the
    remaining 68 byte values (controls, space, DEL…) map to the
    private range starting at U+0100, keeping every mapped character
    printable and whitespace-free so the word-level merge machinery
    never sees a byte it must escape.

    Why byte level: the alphabet is CLOSED — 256 base symbols cover
    any input, so a character never seen in training still encodes
    (as its bytes) and decodes exactly; there is no OOV at any corpus
    scale."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAC + 1))
        + list(range(0xAE, 0xFF + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


@lru_cache(maxsize=1)
def _unicode_byte_map() -> dict:
    return {c: b for b, c in byte_unicode_map().items()}


def _to_byte_space(word: str) -> str:
    m = byte_unicode_map()
    return "".join(m[b] for b in word.encode("utf-8"))


def bpe_decode_tokens(tokens: Sequence[str], byte_level: bool = False) -> str:
    """Invert an encoded token sequence back to the (whitespace-
    stripped) text. Byte-level tokens concatenate to the mapped byte
    stream, which inverts exactly — even when a merge boundary falls
    INSIDE a multi-byte UTF-8 character, because only the full
    concatenation is decoded. Character-level tokens concatenate
    directly."""
    joined = "".join(tokens)
    if not byte_level:
        return joined
    inv = _unicode_byte_map()
    return bytes(inv[c] for c in joined).decode("utf-8")


def bpe_learn_merges(
    docs: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_sample: int = 65536,
    seed: int = 23,
    byte_level: bool = False,
) -> List[Tuple[str, str]]:
    """Learn a BPE merge table from a bounded deterministic corpus
    sample: ``train_sample`` docs picked by seeded id-hash order (the
    :func:`~..operators.similarity.pq_codebooks` sampling rule —
    reproducible and partition-invariant), whitespace words split to
    characters, then the classic greedy loop — count adjacent symbol
    pairs weighted by word frequency, merge the most frequent pair,
    repeat. Ties break on the lexicographically smallest pair, so the
    table is fully deterministic. Stops early when no pair repeats
    (every word fused to one symbol). Returns the ordered merge list
    — priority IS list order, the contract :func:`bpe_encode`
    consumes.

    ``byte_level=True`` trains in the GPT-2 byte alphabet (words are
    mapped through :func:`byte_unicode_map` before the character
    split), closing the vocabulary at 256 base symbols; on printable-
    ASCII corpora the mapping is the identity, so byte-level and
    character-level merge tables coincide (test-pinned)."""
    from ..functions.sampling import seeded_sample_rows

    rows = seeded_sample_rows(docs, [text_col], train_sample, seed, id_col)
    word_freq: dict = {}
    for r in rows:
        for w in (r[0] or "").split():
            word_freq[w] = word_freq.get(w, 0) + 1
    if byte_level:
        # the byte map is a bijection, so converting the DISTINCT
        # words preserves frequencies — type-count cost, not
        # token-count cost (review finding: mapping per occurrence
        # paid millions of per-token Python calls on the driver)
        word_freq = {_to_byte_space(w): c for w, c in word_freq.items()}
    return _learn_merges_from_freqs(word_freq, n_merges)


def _learn_merges_from_freqs(
    word_freq: dict, n_merges: int
) -> List[Tuple[str, str]]:
    """Driver-side greedy merge loop over a word-frequency dict — the
    pure core of :func:`bpe_learn_merges`, exposed separately so the
    naive-recount equivalence fuzz in tests can drive it without a
    SparkSession."""
    # each word as a tuple of symbols; start at characters.
    # INCREMENTAL trainer (round-9 review: the first cut re-counted
    # every pair over every word per merge — O(n_merges x total
    # symbols) driver work; the standard trainer touches only words
    # containing the just-merged pair): pair counts and a pair->words
    # inverted index are built once, then each merge re-segments ONLY
    # where[best] and patches counts by delta. Count states after
    # each merge are identical to a full recount by construction
    # (only changed words' contributions change), so the merge
    # SEQUENCE is bit-identical to the naive loop (equivalence
    # brute-force-checked on randomized corpora in tests).
    words = {w: tuple(w) for w in word_freq}
    counts: dict = {}
    where: dict = {}
    for w, sym in words.items():
        f = word_freq[w]
        for pair in zip(sym, sym[1:]):
            counts[pair] = counts.get(pair, 0) + f
            where.setdefault(pair, set()).add(w)
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            # nothing repeats: further merges would just memorize
            # single occurrences — the standard stop
            break
        merges.append(best)
        fused = best[0] + best[1]
        for w in list(where.get(best, ())):
            f = word_freq[w]
            sym = words[w]
            for pair in zip(sym, sym[1:]):
                c = counts[pair] - f
                if c > 0:
                    counts[pair] = c
                else:
                    del counts[pair]
                # a pair occurring twice in w (sole contributor) can
                # drop its where-entry at the FIRST occurrence while
                # counts still holds the second's contribution — guard
                # the second lookup (caught by the 5000-trial
                # equivalence fuzz in tests)
                ws = where.get(pair)
                if ws is not None:
                    ws.discard(w)
                    if not ws:
                        del where[pair]
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(fused)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_sym = tuple(out)
            words[w] = new_sym
            for pair in zip(new_sym, new_sym[1:]):
                counts[pair] = counts.get(pair, 0) + f
                where.setdefault(pair, set()).add(w)
    return merges


def _encode_word(word: str, ranks: dict) -> List[str]:
    """Encode one word with the frozen merge table: repeatedly apply
    the highest-priority (lowest-rank) applicable merge — the
    standard BPE encode loop, identical to training's merge ORDER so
    a word seen in training reproduces its training tokenization."""
    sym = list(word)
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    corpus: DataFrame,
    merges: Sequence[Tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    byte_level: bool = False,
    special_tokens: Sequence[str] = (),
) -> DataFrame:
    """Encode every document with a FROZEN merge table: one Arrow
    pass, row-local, linear in corpus size — the incremental-ingest
    path encodes only new batches against the stored table, exactly
    like :func:`~.similarity.pq_index_append` encodes against frozen
    codebooks (retraining the tokenizer is a REBUILD: new merges
    re-tokenize every stored document, so the trigger is a measured
    OOV/fertility drift, not a per-batch retrain).

    Per batch, each DISTINCT word is encoded once and cached — on
    Zipfian text the cache hit rate is the corpus's type/token ratio,
    so the per-word Python loop runs orders of magnitude fewer times
    than the token count. Returns ``(id, tokens, n_tokens)`` where
    ``tokens`` concatenates the per-word subword sequences in order
    (joining them with no separator reconstructs the
    whitespace-stripped document — the invariant the registry
    contract pins).

    ``byte_level=True`` encodes in the GPT-2 byte alphabet (words map
    through :func:`byte_unicode_map` first): the vocabulary is CLOSED
    at 256 base symbols, so any character — including ones absent from
    the training sample — encodes, and :func:`bpe_decode_tokens`
    inverts exactly. Pair the flag with a table trained at the same
    setting; mixing levels is a caller error (byte-space symbols
    simply never match char-space merges, so nothing merges).

    ``special_tokens`` reserves control strings (``<|endoftext|>``
    et al., the GPT-2 practice): each occurrence is emitted as ONE
    token, verbatim — never split to bytes/chars, never merged across,
    and the surrounding text encodes exactly as it would without the
    marker. Reservation is an encode-side contract; the trainer is
    untouched (specials are injected into corpora by the pipeline,
    not learned)."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    id_type = corpus.schema[id_col].dataType.simpleString()
    specials = [s for s in special_tokens if s]
    spec_re = (
        re.compile("(" + "|".join(re.escape(s) for s in specials) + ")")
        if specials
        else None
    )
    spec_set = set(specials)

    def _word_tokens(w: str, cache: dict) -> List[str]:
        got = cache.get(w)
        if got is None:
            got = _encode_word(_to_byte_space(w) if byte_level else w, ranks)
            cache[w] = got
        return got

    def enc(batches):
        cache: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            out_tokens = []
            for text in pdf["__text"]:
                toks: List[str] = []
                text = text or ""
                segments = spec_re.split(text) if spec_re else (text,)
                for seg in segments:
                    if seg in spec_set:
                        toks.append(seg)
                        continue
                    for w in seg.split():
                        toks.extend(_word_tokens(w, cache))
                out_tokens.append(toks)
            yield pd.DataFrame(
                {"id": pdf["__id"], "tokens": out_tokens}
            )

    return (
        corpus.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text"))
        .mapInPandas(enc, schema=f"id {id_type}, tokens array<string>")
        .select(
            F.col("id").alias(id_col),
            "tokens",
            F.size("tokens").cast("long").alias("n_tokens"),
        )
    )


def bpe_save_merges(spark, merges: Sequence[Tuple[str, str]], path: str) -> None:
    """Persist a merge table as a tiny parquet artifact — one row per
    merge with its PRIORITY (list position), the same
    snapshot-fit/serve split as ``similarity.pq_save_books``: train
    once per corpus snapshot, every later encode job (batch or the
    incremental-ingest delta path) reloads the identical table.
    Strings round-trip parquet exactly, so a reloaded table encodes
    every document to the same tokens (test-pinned)."""
    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    spark.createDataFrame(
        rows, "priority int, left string, right string"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def bpe_load_merges(spark, path: str) -> List[Tuple[str, str]]:
    """Reload a :func:`bpe_save_merges` artifact in priority order."""
    rows = spark.read.parquet(path).collect()
    return [
        (r.left, r.right) for r in sorted(rows, key=lambda r: r.priority)
    ]


def bpe_vocab(
    merges: Sequence[Tuple[str, str]],
    special_tokens: Sequence[str] = (),
) -> List[str]:
    """The deterministic id table for a BYTE-LEVEL merge table: token
    string at position i has id i. Layout: special tokens first (their
    ids stay stable as the merge table grows across retrains — the
    property downstream configs depend on), then the 256 base byte
    symbols in byte order, then merged symbols in merge-priority
    order. Because the byte alphabet is CLOSED, this vocabulary is
    complete — every token :func:`bpe_encode` can emit under
    ``byte_level=True`` (with the same specials) has an id, so there
    is no unknown-token id at any corpus scale. Char-level tables are
    NOT supported: their base alphabet is data-dependent (chars seen
    in training), so no finite id table covers unseen input."""
    m = byte_unicode_map()
    base = [m[b] for b in range(256)]
    fused = [a + b for a, b in merges]
    out = list(special_tokens) + base + fused
    if len(set(out)) != len(out):
        raise ValueError("special tokens collide with vocabulary symbols")
    return out


def bpe_encode_ids(
    corpus: DataFrame,
    merges: Sequence[Tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    special_tokens: Sequence[str] = (),
) -> DataFrame:
    """Model-ready encoding: byte-level :func:`bpe_encode` emitting
    INTEGER ids under the :func:`bpe_vocab` table — the shape a
    training pipeline actually ships (token strings are a debugging
    view; packing, attention masks and loss all consume ids). Same
    one-Arrow-pass shape with the per-batch distinct-word cache; the
    token->id map is a plain dict lookup appended to the cached
    per-word encode, so the id lookup is paid once per distinct word
    per batch, like the encode itself.

    Returns ``(id, token_ids array<int>, n_tokens)``. Exact
    invertibility: ``vocab[i]`` for each id reconstructs the token
    stream, and :func:`bpe_decode_tokens` on that stream restores the
    whitespace-stripped text (test-pinned)."""
    import pandas as pd

    vocab = bpe_vocab(merges, special_tokens)
    tok_id = {t: i for i, t in enumerate(vocab)}
    ranks = {pair: i for i, pair in enumerate(merges)}
    id_type = corpus.schema[id_col].dataType.simpleString()
    specials = [s for s in special_tokens if s]
    spec_re = (
        re.compile("(" + "|".join(re.escape(s) for s in specials) + ")")
        if specials
        else None
    )
    spec_ids = {s: tok_id[s] for s in specials}

    def enc(batches):
        cache: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            out_ids = []
            for text in pdf["__text"]:
                ids: List[int] = []
                text = text or ""
                segments = spec_re.split(text) if spec_re else (text,)
                for seg in segments:
                    sid = spec_ids.get(seg)
                    if sid is not None:
                        ids.append(sid)
                        continue
                    for w in seg.split():
                        got = cache.get(w)
                        if got is None:
                            got = [
                                tok_id[t]
                                for t in _encode_word(_to_byte_space(w), ranks)
                            ]
                            cache[w] = got
                        ids.extend(got)
                out_ids.append(ids)
            yield pd.DataFrame({"id": pdf["__id"], "token_ids": out_ids})

    return (
        corpus.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text"))
        .mapInPandas(enc, schema=f"id {id_type}, token_ids array<int>")
        .select(
            F.col("id").alias(id_col),
            "token_ids",
            F.size("token_ids").cast("long").alias("n_tokens"),
        )
    )
