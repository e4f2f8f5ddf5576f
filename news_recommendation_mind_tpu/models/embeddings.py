"""Token embedding tables.

Counterparts of the reference's Embeddings/ (models/Embeddings/BERT.py:16-37
extracts a PLM's word_embeddings table; models/Embeddings/Random.py is the
random/GloVe table). Both collapse to one flax module here: a [vocab, dim]
table with an optional pretrained initializer (GloVe rows or a PLM's
word-embedding matrix loaded offline). Multi-host row sharding of this
table lives in parallel/sharded_embedding.py.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class WordEmbedding(nn.Module):
    """Token-id → embedding lookup with optional pretrained init."""
    vocab_size: int
    embedding_dim: int
    pretrained: Optional[np.ndarray] = None  # [vocab, dim] to initialise from
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        if self.pretrained is not None:
            init: Callable = lambda key, shape, dtype: jnp.asarray(
                self.pretrained, dtype)
        else:
            init = nn.initializers.normal(stddev=0.02)
        table = self.param("embedding", init,
                           (self.vocab_size, self.embedding_dim), jnp.float32)
        return jnp.take(table, token_ids, axis=0,
                        mode="clip").astype(self.dtype)
