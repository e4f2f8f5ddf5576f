"""Native tokenizer vs the Python WordTokenizer (exact parity)."""
import numpy as np
import pytest

from news_recommendation_mind_tpu.data.native_tokenizer import (
    encode_corpus, get_library,
)
from news_recommendation_mind_tpu.data.tokenizer import WordTokenizer


def test_library_builds():
    assert get_library() is not None


def test_exact_parity_with_python():
    corpus = [
        "Hello, world! This is News-Article number 42.",
        "punctuation...everywhere; really?!",
        "",
        "repeat repeat repeat " * 30,           # forces truncation
        "MiXeD CaSe TOKENS and café naïve",     # unicode symbols
    ]
    tok = WordTokenizer.build(corpus)
    out = encode_corpus(tok, corpus, max_length=24)
    assert out is not None
    ids, attn = out
    for i, text in enumerate(corpus):
        ref_ids, ref_attn = tok.encode(text, 24)
        np.testing.assert_array_equal(ids[i], ref_ids, err_msg=text)
        np.testing.assert_array_equal(attn[i], ref_attn, err_msg=text)


def test_unknown_words_map_to_unk():
    tok = WordTokenizer.build(["known words only"])
    ids, attn = encode_corpus(tok, ["known unknown"], max_length=8)
    assert ids[0][1] == tok.vocab["known"]
    assert ids[0][2] == tok.unk_token_id


def test_cache_build_uses_native(tmp_path):
    from news_recommendation_mind_tpu.data import (
        build_news_cache, generate_synthetic_mind,
    )
    from news_recommendation_mind_tpu.data.cache import parse_news_tsv
    root = str(tmp_path / "mind")
    generate_synthetic_mind(root, n_news=50, seed=2)
    _, texts = parse_news_tsv(f"{root}/MINDsynthetic_train/news.tsv")
    tok = WordTokenizer.build(texts)
    cache = build_news_cache(f"{root}/MINDsynthetic_train/news.tsv",
                             str(tmp_path / "c"), tok, max_token_length=32)
    # whatever path built it, the result matches the Python encode
    ref_ids, ref_attn = tok.encode(texts[7], 32)
    np.testing.assert_array_equal(cache.tokens[8], ref_ids)
    np.testing.assert_array_equal(cache.attn_mask[8], ref_attn)
