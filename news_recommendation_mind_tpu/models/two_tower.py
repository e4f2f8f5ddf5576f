"""Two-tower model: embedding → news encoder (both towers) → user encoder →
scaled-dot scoring, plus the in-impression sampled-softmax loss.

Capability parity with the reference TwoTower/TwoTowerBaseModel
(reference models/TwoTower.py:3-48, models/TwoTowerBaseModel.py:51-84):

- score = cdd·userᵀ/√d                 (TwoTowerBaseModel.py:51-62)
- train: log_softmax over candidates + NLL at the positive's index
  (TwoTowerBaseModel.py:70-71) — here with the candidate pad mask folded
  into the softmax (the reference scores zero-padded candidates as if
  real; masking them out is strictly closer to the intended objective).
- inference: sigmoid(score)            (TwoTowerBaseModel.py:72-73)
- fast-eval scoring from a precomputed news table: ``score_from_reprs``
  is the counterpart of predict_fast (TwoTowerBaseModel.py:78-84); the
  [news_num+1, H] table itself is produced by evaluation/engine.py's
  encode-news sweep and looked up outside the model.
"""
from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp


Batch = Dict[str, jnp.ndarray]


class TwoTower(nn.Module):
    """Composition of embedding / encoderN / encoderU as submodules."""
    embedding: nn.Module
    news_encoder: nn.Module
    user_encoder: nn.Module
    hidden_dim: int

    def encode_news(self, tokens: jnp.ndarray, attn_mask: jnp.ndarray,
                    deterministic: bool = True) -> jnp.ndarray:
        """[B, N, S] tokens → [B, N, H] news representations.

        With ``embedding=None`` the news encoder consumes token ids
        directly (fused embedding+encoder modules like
        FusedCnnNewsEncoder own their table)."""
        x = tokens if self.embedding is None else self.embedding(tokens)
        _, repr_ = self.news_encoder(x, attn_mask,
                                     deterministic=deterministic)
        return repr_

    def encode_user(self, his_tokens: jnp.ndarray, his_attn: jnp.ndarray,
                    his_mask: jnp.ndarray,
                    user_id: Optional[jnp.ndarray] = None,
                    deterministic: bool = True) -> jnp.ndarray:
        """History tokens → [B, 1, H] user representation."""
        his_repr = self.encode_news(his_tokens, his_attn, deterministic)
        return self.user_encoder(his_repr, his_mask=his_mask,
                                 user_id=user_id,
                                 deterministic=deterministic)

    def encode_user_from_reprs(self, his_repr: jnp.ndarray,
                               his_mask: jnp.ndarray,
                               user_id: Optional[jnp.ndarray] = None,
                               deterministic: bool = True) -> jnp.ndarray:
        """Fast-eval path: user repr from cached history news reprs
        (counterpart of the PLM history short-circuit, reference
        models/PLM.py:110-113)."""
        return self.user_encoder(his_repr, his_mask=his_mask,
                                 user_id=user_id,
                                 deterministic=deterministic)

    def compute_score(self, cdd_repr: jnp.ndarray,
                      user_repr: jnp.ndarray) -> jnp.ndarray:
        """[B, C, H] x [B, 1, H] → [B, C] scaled dot product."""
        d = jnp.asarray(cdd_repr.shape[-1], cdd_repr.dtype)
        return jnp.einsum("bch,buh->bc", cdd_repr,
                          user_repr) / jnp.sqrt(d)

    def __call__(self, batch: Batch,
                 deterministic: bool = True) -> jnp.ndarray:
        """Full forward: batch dict → scores [B, C] (pre-activation)."""
        cdd_repr = self.encode_news(batch["cdd_token"], batch["cdd_attn"],
                                    deterministic)
        user_repr = self.encode_user(batch["his_token"], batch["his_attn"],
                                     batch["his_mask"],
                                     batch.get("user_id"), deterministic)
        return self.compute_score(cdd_repr, user_repr)


def forward_from_unique(mdl, batch: Batch,
                        deterministic: bool = True) -> jnp.ndarray:
    """Forward pass over batch-deduplicated news → scores [B, C].

    Candidate/history slots in a batch repeat the same articles heavily
    (shared impressions, overlapping histories), yet the news tower is
    user-independent — so each distinct article only needs encoding once
    per step. The host loader emits the batch's unique news
    (``uniq_token``/``uniq_attn`` [U, S]) plus per-slot indices
    (``cdd_pos`` [B, C], ``his_pos`` [B, N] into U); this encodes U
    articles instead of B·(C+N) and gathers representations per slot.
    Mathematically identical to the plain forward (the gather's
    scatter-add backward sums duplicate-slot gradients exactly); the one
    behavioural difference is that encoder dropout is shared across
    duplicate occurrences. Works for any model with the TwoTower duck
    type (TwoTower, PLM — where it removes duplicate full BERT passes).

    Use via ``model.apply(params, batch, method=forward_from_unique)``.
    """
    reprs = mdl.encode_news(batch["uniq_token"][None],
                            batch["uniq_attn"][None],
                            deterministic)[0]           # [U, H]
    cdd_repr = jnp.take(reprs, batch["cdd_pos"], axis=0, mode="clip")
    his_repr = jnp.take(reprs, batch["his_pos"], axis=0, mode="clip")
    user_repr = mdl.encode_user_from_reprs(his_repr, batch["his_mask"],
                                           batch.get("user_id"),
                                           deterministic)
    return mdl.compute_score(cdd_repr, user_repr)


def train_loss(scores: jnp.ndarray, label: jnp.ndarray,
               cdd_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """In-impression sampled-softmax cross-entropy.

    scores [B, C], label [B] = index of the positive candidate,
    cdd_mask [B, C] marks real (non-padded) candidates. Equivalent to the
    reference's log_softmax + NLLLoss (reference
    models/TwoTowerBaseModel.py:70-71, utils/Manager.py:377-386) with
    padded candidates excluded from the partition function.
    """
    if cdd_mask is not None:
        scores = jnp.where(cdd_mask > 0, scores, -1e9)
    logp = nn.log_softmax(scores, axis=-1)
    nll = -jnp.take_along_axis(logp, label[:, None], axis=-1)[:, 0]
    return nll.mean()
