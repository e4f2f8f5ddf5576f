"""Native (C++/OpenMP) batcher: build, semantics, determinism, speed."""
import numpy as np
import pytest

from news_recommendation_mind_tpu.data import (
    TrainLoader, WordTokenizer, build_behaviors, build_news_cache,
    generate_synthetic_mind,
)
from news_recommendation_mind_tpu.data.cache import parse_news_tsv
from news_recommendation_mind_tpu.data.native_batcher import get_library


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mind"))
    generate_synthetic_mind(root, seed=5)
    _, texts = parse_news_tsv(f"{root}/MINDsynthetic_train/news.tsv")
    tok = WordTokenizer.build(texts)
    cache_dir = str(tmp_path_factory.mktemp("cache"))
    news = build_news_cache(f"{root}/MINDsynthetic_train/news.tsv",
                            cache_dir, tok, max_token_length=64)
    b = build_behaviors(f"{root}/MINDsynthetic_train/behaviors.tsv",
                        news.nid2idx, "train")
    return news, b


def _loader(news, b, backend, **kw):
    base = dict(batch_size=32, npratio=4, his_size=10, signal_length=12,
                seed=11)
    base.update(kw)
    return TrainLoader(news, b, backend=backend, **base)


def test_library_builds():
    assert get_library() is not None, "g++ build of native batcher failed"


def test_native_batch_semantics(dataset):
    news, b = dataset
    loader = _loader(news, b, "native")
    assert loader.backend == "native"
    batch = next(iter(loader))
    numpy_loader = _loader(news, b, "numpy")
    ref = next(iter(numpy_loader))
    # same example order (epoch permutation is backend-independent) and
    # identical positives/histories; negatives may differ (RNG streams)
    np.testing.assert_array_equal(batch["user_id"], ref["user_id"])
    np.testing.assert_array_equal(batch["cdd_id"][:, 0], ref["cdd_id"][:, 0])
    np.testing.assert_array_equal(batch["his_id"], ref["his_id"])
    np.testing.assert_array_equal(batch["his_mask"], ref["his_mask"])
    np.testing.assert_array_equal(batch["his_token"], ref["his_token"])
    assert (batch["label"] == 0).all()
    # token gather is consistent with cdd ids
    sl = loader.sl if hasattr(loader, "sl") else 12
    np.testing.assert_array_equal(
        batch["cdd_token"], loader.news_tokens[batch["cdd_id"]])
    np.testing.assert_array_equal(
        batch["his_attn"], loader.news_attn[batch["his_id"]])
    # negatives come from the sample's pool, no duplicates
    for i in range(32):
        negs = batch["cdd_id"][i, 1:]
        real = negs[batch["cdd_mask"][i, 1:] > 0]
        assert len(np.unique(real)) == len(real)


def test_native_determinism(dataset):
    news, b = dataset
    b1 = next(iter(_loader(news, b, "native")))
    b2 = next(iter(_loader(news, b, "native")))
    for k in b1:
        np.testing.assert_array_equal(b1[k], b2[k])
    # different epoch → different batches
    l3 = _loader(news, b, "native")
    l3.set_epoch(3)
    b3 = next(iter(l3))
    assert not np.array_equal(b3["cdd_id"], b1["cdd_id"])


def test_native_shuffle_pos_tracks_label(dataset):
    news, b = dataset
    loader = _loader(news, b, "native", shuffle_pos=True)
    batch = next(iter(loader))
    rows = np.arange(len(batch["label"]))
    pos_ids = batch["cdd_id"][rows, batch["label"]]
    assert (pos_ids > 0).all()
    assert batch["label"].max() > 0


def test_native_faster_than_numpy(dataset):
    import time
    news, b = dataset
    ln = _loader(news, b, "native", batch_size=128)
    lp = _loader(news, b, "numpy", batch_size=128)

    def rate(loader):
        n = 0
        t0 = time.time()
        for batch in loader:
            n += len(batch["label"])
        return n / (time.time() - t0)

    rate(ln)  # warm
    # best-of-3 per side: wall-clock rates are noisy when the machine is
    # loaded (the full suite runs alongside TPU jobs); the native batcher
    # is ~15x faster unloaded, so best-of wins are stable
    r_native = max(rate(ln) for _ in range(3))
    r_numpy = max(rate(lp) for _ in range(3))
    assert r_native > r_numpy, (r_native, r_numpy)
