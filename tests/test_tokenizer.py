"""BPE trainer + distributed encoder (operators/tokenizer.py)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators.tokenizer import (
    bpe_encode,
    bpe_learn_merges,
)


def test_bpe_learns_the_classic_merge_sequence(spark):
    """Sennrich's worked example shape: 'low'x3 + 'lower' + 'lowest'.
    Pair counts give (l,o)=5 tied with (o,w)=5 -> lexicographic min
    picks (l,o); then (lo,w)=5; then (low,e)=2; then the <2 stop rule
    ends training (every remaining pair occurs once)."""
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="low low low lower lowest")]
    )
    merges = bpe_learn_merges(docs, n_merges=10)
    assert merges == [("l", "o"), ("lo", "w"), ("low", "e")]


def test_bpe_encode_roundtrip_and_priority(spark):
    """Encoding applies merges by PRIORITY, concatenating a doc's
    tokens reproduces its whitespace-stripped text, unseen words fall
    back to characters, and the encode is deterministic across
    partition layouts (the cache is per-batch, pure)."""
    train = spark.createDataFrame(
        [Row(doc_id=0, text="low low low lower lowest")]
    )
    merges = bpe_learn_merges(train, n_merges=10)
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text="low lowest"),
            Row(doc_id=2, text="slow glow"),
            Row(doc_id=3, text=""),
        ]
    )
    out = {r.doc_id: r for r in bpe_encode(corpus, merges).collect()}
    assert out[1].tokens == ["low", "lowe", "s", "t"]
    # unseen words: merges still apply where subword pairs match
    assert out[2].tokens == ["s", "low", "g", "low"]
    assert out[3].tokens == [] and out[3].n_tokens == 0
    for r in out.values():
        doc = corpus.filter(F.col("doc_id") == r.doc_id).first()
        assert "".join(r.tokens) == "".join(doc.text.split())
    out2 = {
        r.doc_id: r.tokens
        for r in bpe_encode(corpus.repartition(5), merges).collect()
    }
    assert out2 == {k: v.tokens for k, v in out.items()}


def test_bpe_trainer_sample_is_partition_invariant(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="spark line column order " * (1 + i % 3)) for i in range(40)]
    )
    m1 = bpe_learn_merges(docs, n_merges=8)
    m2 = bpe_learn_merges(docs.repartition(7), n_merges=8)
    assert m1 == m2 and m1


def test_bpe_merge_table_roundtrips_exactly(spark, tmp_path):
    """The persisted merge table reloads bit-exactly in priority
    order, and encoding through the RELOADED artifact is identical to
    encoding through the in-memory table — the deploy path a nightly
    ingest job uses."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.tokenizer import (
        bpe_load_merges,
        bpe_save_merges,
    )

    train = spark.createDataFrame(
        [Row(doc_id=0, text="low low low lower lowest slow glow")]
    )
    merges = bpe_learn_merges(train, n_merges=10)
    path = str(tmp_path / "merges")
    bpe_save_merges(spark, merges, path)
    assert bpe_load_merges(spark, path) == merges
    got = {
        r.doc_id: r.tokens
        for r in bpe_encode(train, bpe_load_merges(spark, path)).collect()
    }
    want = {r.doc_id: r.tokens for r in bpe_encode(train, merges).collect()}
    assert got == want


def test_incremental_trainer_equals_naive_recount_fuzz():
    """The incremental pair-count/inverted-index trainer must produce
    the BIT-IDENTICAL merge sequence to a naive full-recount loop on
    randomized corpora (pure-python, no Spark; the shipped trainer's
    driver core). Includes the duplicate-pair/sole-contributor case
    that desynced the where-index in the first cut."""
    import random

    def naive(word_freq, n_merges):
        words = {w: tuple(w) for w in word_freq}
        merges = []
        for _ in range(n_merges):
            counts = {}
            for w, sym in words.items():
                f = word_freq[w]
                for a, b in zip(sym, sym[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + f
            if not counts:
                break
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            if counts[best] < 2:
                break
            merges.append(best)
            fused = best[0] + best[1]
            new_words = {}
            for w, sym in words.items():
                out, i = [], 0
                while i < len(sym):
                    if (
                        i + 1 < len(sym)
                        and sym[i] == best[0]
                        and sym[i + 1] == best[1]
                    ):
                        out.append(fused)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                new_words[w] = tuple(out)
            words = new_words
        return merges

    from api_kakfa_spark_airflow_s3_athena_spark.operators.tokenizer import (
        _learn_merges_from_freqs,
    )

    rng = random.Random(13)
    for _ in range(800):
        wf = {}
        for _ in range(rng.randint(1, 14)):
            w = "".join(rng.choice("abcd") for _ in range(rng.randint(1, 10)))
            wf[w] = wf.get(w, 0) + rng.randint(1, 5)
        nm = rng.randint(1, 20)
        assert naive(dict(wf), nm) == _learn_merges_from_freqs(dict(wf), nm)
    # the desync case verbatim: duplicate pair, sole contributor
    assert naive({"abab": 3}, 5) == _learn_merges_from_freqs({"abab": 3}, 5)


def test_byte_level_alphabet_is_a_256_bijection():
    from api_kakfa_spark_airflow_s3_athena_spark.operators.tokenizer import (
        byte_unicode_map,
    )

    m = byte_unicode_map()
    assert sorted(m.keys()) == list(range(256))
    assert len(set(m.values())) == 256
    # printable ASCII maps to itself (specials made of it round-trip
    # through decode untouched); every mapped char is non-whitespace
    for b in range(ord("!"), ord("~") + 1):
        assert m[b] == chr(b)
    assert not any(c.isspace() for c in m.values())


def test_byte_level_matches_char_level_on_ascii(spark):
    """Printable-ASCII corpora: the byte map is the identity, so the
    byte-level trainer learns the IDENTICAL merge table."""
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="low low low lower lowest")]
    )
    assert bpe_learn_merges(docs, n_merges=10, byte_level=True) == \
        bpe_learn_merges(docs, n_merges=10)


def test_byte_level_encodes_unseen_unicode_and_decodes_exactly(spark):
    """The closed 256-symbol alphabet: characters absent from training
    (emoji, CJK) still encode, and decoding the token stream restores
    the exact whitespace-stripped text — even though merge boundaries
    can fall inside multi-byte UTF-8 sequences."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.tokenizer import (
        bpe_decode_tokens,
    )

    train = spark.createDataFrame([Row(doc_id=0, text="abc abc ab")])
    merges = bpe_learn_merges(train, n_merges=5, byte_level=True)
    target = spark.createDataFrame(
        [Row(doc_id=1, text="abc café \U0001f600\U0001f600 中文")]
    )
    rows = bpe_encode(target, merges, byte_level=True).collect()
    toks = rows[0].tokens
    assert bpe_decode_tokens(toks, byte_level=True) == "abccafé\U0001f600\U0001f600中文"
    # char-level default would keep the raw chars; byte level must not
    assert "\U0001f600" not in toks


def test_special_tokens_are_atomic_and_neutral(spark):
    """A reserved control string is emitted as ONE verbatim token,
    never split or merged across, and text around it encodes exactly
    as it does without the marker."""
    train = spark.createDataFrame(
        [Row(doc_id=0, text="low low low lower lowest")]
    )
    merges = bpe_learn_merges(train, n_merges=10)
    plain = spark.createDataFrame([Row(doc_id=1, text="low lowest")])
    marked = spark.createDataFrame(
        [Row(doc_id=1, text="low<|endoftext|>lowest")]
    )
    p = bpe_encode(plain, merges).collect()[0].tokens
    m = bpe_encode(
        marked, merges, special_tokens=["<|endoftext|>"]
    ).collect()[0].tokens
    assert m.count("<|endoftext|>") == 1
    assert [t for t in m if t != "<|endoftext|>"] == p
    # without reservation the marker's characters leak into words
    leaked = bpe_encode(marked, merges).collect()[0].tokens
    assert "<|endoftext|>" not in leaked


def test_special_tokens_compose_with_byte_level(spark):
    from api_kakfa_spark_airflow_s3_athena_spark.operators.tokenizer import (
        bpe_decode_tokens,
    )

    train = spark.createDataFrame([Row(doc_id=0, text="ab ab ab")])
    merges = bpe_learn_merges(train, n_merges=3, byte_level=True)
    df = spark.createDataFrame(
        [Row(doc_id=1, text="ab <|eot|> café<|eot|>")]
    )
    toks = bpe_encode(
        df, merges, byte_level=True, special_tokens=["<|eot|>"]
    ).collect()[0].tokens
    assert toks.count("<|eot|>") == 2
    # specials are printable ASCII -> identity under the byte map, so
    # decoding the full stream (specials included) is still exact
    assert bpe_decode_tokens(toks, byte_level=True) == "ab<|eot|>café<|eot|>"


def test_bpe_vocab_layout_and_closure():
    from api_kakfa_spark_airflow_s3_athena_spark.operators.tokenizer import (
        bpe_vocab,
        byte_unicode_map,
    )

    merges = [("a", "b"), ("ab", "c")]
    v = bpe_vocab(merges, special_tokens=["<|eot|>"])
    assert v[0] == "<|eot|>"                     # specials first, stable ids
    assert v[1:257] == [byte_unicode_map()[b] for b in range(256)]
    assert v[257:] == ["ab", "abc"]              # merge-priority order
    assert len(set(v)) == len(v) == 259
    # a special colliding with a symbol is rejected loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bpe_vocab(merges, special_tokens=["ab"])


def test_bpe_encode_ids_roundtrips_and_matches_string_encode(spark):
    from api_kakfa_spark_airflow_s3_athena_spark.operators.tokenizer import (
        bpe_decode_tokens,
        bpe_encode_ids,
        bpe_vocab,
    )

    train = spark.createDataFrame([Row(doc_id=0, text="low low low lower lowest")])
    merges = bpe_learn_merges(train, n_merges=10, byte_level=True)
    vocab = bpe_vocab(merges, special_tokens=["<|doc|>"])
    target = spark.createDataFrame(
        [Row(doc_id=1, text="<|doc|>low café lowest\U0001f600")]
    )
    ids = bpe_encode_ids(
        target, merges, special_tokens=["<|doc|>"]
    ).collect()[0]
    assert all(0 <= i < len(vocab) for i in ids.token_ids)
    assert ids.n_tokens == len(ids.token_ids)
    toks = [vocab[i] for i in ids.token_ids]
    assert toks[0] == "<|doc|>"
    # ids -> tokens -> text: exact reconstruction incl. unseen unicode
    assert (
        bpe_decode_tokens(toks, byte_level=True)
        == "<|doc|>lowcafélowest\U0001f600"
    )
    # ids are exactly the string encode mapped through the vocab
    str_toks = bpe_encode(
        target, merges, byte_level=True, special_tokens=["<|doc|>"]
    ).collect()[0].tokens
    assert toks == str_toks
