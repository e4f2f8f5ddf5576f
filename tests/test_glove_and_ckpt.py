"""GloVe loading and async checkpointing."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from news_recommendation_mind_tpu.data.glove import (
    find_glove_file, load_glove_matrix,
)
from news_recommendation_mind_tpu.data.tokenizer import WordTokenizer
from news_recommendation_mind_tpu.train import (
    create_train_state, latest_step, load_checkpoint, make_optimizer,
    save_checkpoint,
)
from news_recommendation_mind_tpu.train.checkpoint import (
    wait_for_pending_saves,
)


def test_glove_matrix(tmp_path):
    tok = WordTokenizer.build(["apple banana", "banana cherry"])
    glove_dir = tmp_path / "glove"
    glove_dir.mkdir()
    path = glove_dir / "glove.6b.4d.txt"
    path.write_text("apple 1 2 3 4\nbanana 5 6 7 8\nunrelated 9 9 9 9\n")
    assert find_glove_file([str(glove_dir)]) == str(path)
    mat = load_glove_matrix(str(path), tok, 4)
    assert mat.shape == (tok.vocab_size, 4)
    np.testing.assert_array_equal(mat[tok.vocab["apple"]], [1, 2, 3, 4])
    np.testing.assert_array_equal(mat[tok.vocab["banana"]], [5, 6, 7, 8])
    np.testing.assert_array_equal(mat[tok.pad_token_id], [0, 0, 0, 0])
    # cherry not in glove: keeps random init (nonzero)
    assert np.abs(mat[tok.vocab["cherry"]]).sum() > 0


def test_glove_no_overlap_raises(tmp_path):
    tok = WordTokenizer.build(["apple"])
    p = tmp_path / "glove.txt"
    p.write_text("zzz 1 2\n")
    with pytest.raises(ValueError):
        load_glove_matrix(str(p), tok, 2)


def test_async_checkpoint_roundtrip(tmp_path):
    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    opt = make_optimizer(1e-2, 1e-5)
    state = create_train_state(params, opt)
    ckpt = str(tmp_path / "ck")
    for i in range(3):
        state = state.replace(step=state.step + 1)
        save_checkpoint(ckpt, "demo", state, async_save=True)
    save_checkpoint(ckpt, "demo", state, best=True, async_save=True)
    wait_for_pending_saves()
    assert latest_step(ckpt, "demo") == 3
    restored = load_checkpoint(ckpt, "demo", create_train_state(params, opt),
                               best=True)
    assert int(restored.step) == 3
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(params["w"]))
