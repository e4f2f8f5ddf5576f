"""WordPiece parity vs transformers.BertTokenizer (the HF reference).

VERDICT round-1 item 1: the self-contained WordPiece pipeline
(data/wordpiece.py) must be token-for-token identical to HF's
BertTokenizer so PLM cache builds on real MIND produce HF-compatible ids
without the Rust tokenizers dependency (reference utils/MIND.py:90-91,
133). transformers is installed locally; BertTokenizer is constructed
from a vocab file directly (no hub download), which makes HF's
pure-Python pipeline the offline oracle.
"""
import os

import numpy as np
import pytest

from news_recommendation_mind_tpu.data.wordpiece import (
    WordPieceTokenizer, basic_tokenize, train_wordpiece_vocab,
    wordpiece_tokenize)

transformers = pytest.importorskip("transformers")

# tricky corpus: accents, CJK, punctuation globs, contractions, numerals,
# unicode spaces/controls, emoji (unknown), very long words, casing
TRICKY = [
    "Café résumés, naïve façade — coöperate!",
    "don't stop-me now!!! it's 2024/08/20, $5.99 (50% off)",
    "中文测试 mixed with English 日本語 too",
    "weird spaces and​ zero-width﻿joins",
    "UPPERCASE MiXeD lowercase",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
    "x" * 150 + " short",
    "emoji \U0001f600 and symbols ☃ € 100°",
    "  leading, trailing  \t tabs\nnewlines\r\n  ",
    "hyphen-ated co-op e-mail u.s.a. Mr. O'Brien's",
    "",
    "   ",
    "1234567890 3.14159 1e-5 0x1F",
    "éèêë üöä ñ ç őű",
    "quotes “curly” and ‘single’ « guillemets »",
]


def _hf_from_vocab(tok: WordPieceTokenizer, tmp_path):
    vocab_file = os.path.join(str(tmp_path), "vocab.txt")
    tok.save(vocab_file)
    return transformers.BertTokenizer(vocab_file=vocab_file,
                                      do_lower_case=True)


@pytest.fixture(scope="module")
def trained():
    """WordPiece vocab trained on the tricky corpus + filler text."""
    corpus = TRICKY + [
        "the quick brown fox jumps over the lazy dog",
        "news recommendation with transformer models",
        "breaking news: markets rally as rates fall",
    ] * 3
    return train_wordpiece_vocab(corpus, vocab_size=400, min_pair_freq=2)


def test_basic_tokenize_matches_hf(trained, tmp_path):
    hf = _hf_from_vocab(trained, tmp_path)
    for text in TRICKY:
        ours = basic_tokenize(text)
        theirs = hf.basic_tokenizer.tokenize(text)
        assert ours == theirs, f"basic mismatch on {text!r}"


def test_wordpiece_tokenize_matches_hf(trained, tmp_path):
    hf = _hf_from_vocab(trained, tmp_path)
    for text in TRICKY:
        ours = trained.tokenize(text)
        theirs = hf.tokenize(text)
        assert ours == theirs, f"wordpiece mismatch on {text!r}"


def test_encode_matches_hf_padding_truncation(trained, tmp_path):
    hf = _hf_from_vocab(trained, tmp_path)
    for max_length in (8, 30, 64):
        for text in TRICKY:
            ids, attn = trained.encode(text, max_length)
            enc = hf(text, padding="max_length", truncation=True,
                     max_length=max_length)
            np.testing.assert_array_equal(
                ids, np.asarray(enc["input_ids"], dtype=np.int32),
                err_msg=f"ids mismatch on {text!r} @ {max_length}")
            np.testing.assert_array_equal(
                attn, np.asarray(enc["attention_mask"], dtype=np.uint8),
                err_msg=f"attn mismatch on {text!r} @ {max_length}")


def test_handwritten_bert_style_vocab_parity(tmp_path):
    """A hand-built vocab with ## continuations, exercised like
    bert-base-uncased's (greedy longest-match-first semantics)."""
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
              "un", "##aff", "##able", "##ffa", "##ble", "runn", "##ing",
              "run", "##ning", "##n", "the", "a", ",", ".", "!", "'",
              "don", "##t", "##'", "t"]
    vocab = {t: i for i, t in enumerate(tokens)}
    ours = WordPieceTokenizer(vocab)
    hf = _hf_from_vocab(ours, tmp_path)
    for text in ["unaffable running don't", "the unffable run runnning",
                 "a, the. run!"]:
        assert ours.tokenize(text) == hf.tokenize(text)
    # longest-match-first: 'running' must pick 'runn'+'##ing' over
    # 'run'+'##ning'
    assert wordpiece_tokenize("running", vocab, "[UNK]") == ["runn", "##ing"]
    # un-matchable word -> single [UNK]
    assert wordpiece_tokenize("zzz", vocab, "[UNK]") == ["[UNK]"]
    # >100 chars -> [UNK] without matching
    assert wordpiece_tokenize("un" * 60, vocab, "[UNK]") == ["[UNK]"]


def test_vocab_roundtrip(trained, tmp_path):
    path = os.path.join(str(tmp_path), "roundtrip.txt")
    trained.save(path)
    loaded = WordPieceTokenizer.load(path)
    assert loaded.vocab == trained.vocab
    assert loaded.pad_token_id == trained.pad_token_id
    for text in TRICKY:
        assert loaded.tokenize(text) == trained.tokenize(text)


def test_trained_vocab_covers_corpus_subwords(trained):
    # every corpus word should tokenize without [UNK] except the >100-char
    # word and emoji/symbols absent from the alphabet at min_pair_freq
    pieces = trained.tokenize("the quick brown fox jumps over the lazy dog")
    assert "[UNK]" not in pieces
    # frequent words merge into whole-word tokens
    assert "the" in trained.vocab


def test_get_tokenizer_plm_backend_trains_wordpiece(tmp_path):
    """PLM backends must not degrade to word-level ids (VERDICT item 1)."""
    from news_recommendation_mind_tpu.data.tokenizer import get_tokenizer
    vocab_path = os.path.join(str(tmp_path), "wp.txt")
    corpus = ["breaking news today", "markets rally again today"] * 5
    tok = get_tokenizer("bert", vocab_path=vocab_path, corpus=corpus,
                        pretrained_vocab_paths=[],
                        wordpiece_vocab_size=200)
    assert isinstance(tok, WordPieceTokenizer)
    assert os.path.exists(vocab_path)
    # resolution order: a saved trained vocab is reused
    tok2 = get_tokenizer("bert", vocab_path=vocab_path, corpus=None,
                         pretrained_vocab_paths=[])
    assert tok2.vocab == tok.vocab


def test_get_tokenizer_pretrained_vocab_precedence(tmp_path):
    from news_recommendation_mind_tpu.data.tokenizer import get_tokenizer
    pre = os.path.join(str(tmp_path), "pretrained.txt")
    with open(pre, "w", encoding="utf-8") as f:
        for t in ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "news", "##y"]:
            f.write(t + "\n")
    tok = get_tokenizer("bert", pretrained_vocab_paths=[pre])
    assert isinstance(tok, WordPieceTokenizer)
    assert tok.vocab["news"] == 4


def test_plm_cache_build_uses_wordpiece_end_to_end(tmp_path):
    """A PLM config's news cache must be built by the self-contained
    WordPiece pipeline when no HF cache / pretrained vocab exists
    (reference utils/MIND.py:90-91's tokenizer pass, replaced)."""
    from news_recommendation_mind_tpu.config import Config
    from news_recommendation_mind_tpu.experiment import build_data

    tmp = str(tmp_path)
    cfg = Config(scale="synthetic", model="plm", embedding="bert",
                 bert="bert", data_root=os.path.join(tmp, "data"),
                 cache_root=os.path.join(tmp, "cache"),
                 signal_length=10, his_size=4, dtype="float32")
    data = build_data(cfg, splits=("train",))
    assert isinstance(data.tokenizer, WordPieceTokenizer)
    toks = data.news["train"].tokens
    assert toks.max() < data.tokenizer.vocab_size
    # a real subword vocab: '##' continuation pieces exist (the tiny
    # synthetic corpus merges most words whole, so the *cache* may
    # legitimately contain only whole-word tokens)
    assert any(p.startswith("##") for p in data.tokenizer.vocab)
    # the trained vocab persists and is reused on rebuild
    vocab_file = os.path.join(tmp, "cache", "MIND", "vocab",
                              "synthetic_bert_wordpiece.txt")
    assert os.path.exists(vocab_file)


def test_native_wordpiece_matches_python(trained):
    """C++/OpenMP fast path ≡ Python pipeline, char for char (the corpus-
    derived unicodedata table makes this exact by construction)."""
    from news_recommendation_mind_tpu.data.native_wordpiece import (
        encode_corpus)
    texts = TRICKY + [
        "the quick brown fox jumps over the lazy dog",
        "Ünïcödé Mix: Жизнь прекрасна! ßharp İstanbul",
        "a\x1eb separator abuse",  # \x1e is control: removed, words join
    ]
    out = encode_corpus(trained, texts, max_length=32)
    if out is None:
        pytest.skip("no C++ compiler available")
    ids, attn = out
    for i, t in enumerate(texts):
        py_ids, py_attn = trained.encode(t, 32)
        np.testing.assert_array_equal(ids[i], py_ids,
                                      err_msg=f"native ids mismatch on {t!r}")
        np.testing.assert_array_equal(attn[i], py_attn,
                                      err_msg=f"native attn mismatch on {t!r}")
