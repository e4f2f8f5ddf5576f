"""A from-scratch JAX BERT-style encoder powering the PLM/XFormer families.

The reference delegates to HuggingFace ``AutoModel`` with per-variant
surgery (reference models/PLM.py:19-84, models/XFormer.py:18-42). Here one
configurable flax encoder covers the whole variant table:

- standard multi-head attention ("full"),
- dense-synthesizer attention ("synthesizer": scores come from a 2-layer
  MLP on the value projection, no QK product — reference
  models/Modules/Synthesizer.py:16-53),
- local+global windowed attention ("local": banded window + global first
  token) — the Longformer(w=32) pattern (reference models/PLM.py:66-78);
  long sequences ride the fused Pallas banded kernel in ops/,
- BigBird block-sparse attention ("bigbird": 3-block sliding window +
  global first block + per-head STATIC random blocks, deterministic at
  trace time — reference models/PLM.py:66-78's
  BigBirdConfig(block_size=64, num_random_blocks=3)),
- Reformer attention (alternating "chunked" local layers and shared-QK
  "lsh" layers: argmax-over-random-rotations bucketing, stable sort,
  chunked same-bucket attention, unsort — reference models/PLM.py:66-78's
  google/reformer-crime-and-punishment),
- Funnel pooling pyramid (pool_blocks: stride-2 CLS-preserving mean
  pooling between layer blocks, pool-query-only at each boundary layer —
  pooled queries attend unpooled keys/values, Funnel-Transformer §2.2 —
  reference models/PLM.py:30-35).
  All patterns are value-tested against dense-mask formulations in
  tests/test_sparse_attention.py.

Variant table (layers / pooler / windows / special ids / xformer lengths)
mirrors reference utils/Manager.py:917-1026. Pretrained HF weights load via
``load_hf_bert_weights`` when a local HF cache exists; offline environments
train from random init.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .attention import masked_softmax


def _tpu_backend() -> bool:
    """True on real TPU backends (monkeypatch point for CPU tests)."""
    import jax
    return jax.default_backend() in ("tpu", "axon")


def use_banded_mhsa(attention_type: str, window: int, S: int,
                    has_kv: bool, A: int, H: int, n_heads: int) -> bool:
    """Routing predicate for the full-width banded Pallas kernel: the
    long-sequence local-attention self-attention path with an unsliced
    projection width and a head count that tiles 128-lane groups.
    Pinned by tests/test_plm_xformer.py::test_banded_mhsa_routing."""
    from ..ops.pallas_attention import banded_mhsa_plan
    return (attention_type == "local" and window > 0 and S > 256
            and not has_kv and A == H and _tpu_backend()
            and banded_mhsa_plan(S, H, n_heads) is not None)


@dataclass(frozen=True)
class BertVariantConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    eps: float = 1e-12
    # full | synthesizer | local | disentangled | bigbird | chunked | lsh
    attention_type: str = "full"
    window: int = 0                   # local attention half-window
    # per-layer attention-type cycle (reformer alternates chunked/LSH,
    # google/reformer-crime-and-punishment attn_layers); empty = uniform
    attention_layers: Tuple[str, ...] = ()
    block_size: int = 0               # bigbird block width
    num_random_blocks: int = 3        # bigbird random blocks per row-block
    chunk_size: int = 0               # reformer chunk width
    num_buckets: int = 32             # reformer LSH buckets (even)
    # per-head projection width when it differs from hidden/num_heads
    # (HF Reformer attention_head_size: crime-and-punishment projects
    # 256 → 2 heads × 64 = 128); 0 = hidden_size // num_heads
    attention_head_size: int = 0
    layer_seed: int = 0               # static per-layer seed (LSH/random)
    pool_blocks: int = 0              # funnel: pooling blocks (stride-2)
    # disentangled (DeBERTa) attention: which relative components to add
    # and whether absolute position embeddings feed the input
    # (microsoft/deberta-base: c2p+p2c, position_biased_input=False)
    pos_att_types: Tuple[str, ...] = ()
    position_biased_input: bool = True
    max_relative: int = 0             # 0 → max_position
    # Reformer axial position factorization (HF axial_pos_shape /
    # axial_pos_embds_dim): position p = i0*s1 + i1 gets
    # concat(w0[i0] [d0], w1[i1] [d1]); empty shape = one learned table.
    # Dims default to (H//4, H-H//4) — (64, 192) at the checkpoint's
    # H=256 — so shrunk test widths stay consistent.
    axial_pos_shape: Tuple[int, ...] = ()
    axial_pos_dims: Tuple[int, ...] = ()
    pooler: str = "tanh"              # tanh | gelu_cls | cls
    signal_length: int = 30           # synthesizer score-MLP width
    pad_token_id: int = 0
    cls_token_id: int = 101
    sep_token_id: int = 102
    # XFormer long-context budget (reference utils/Manager.py:1013-1026)
    max_length: int = 512
    max_length_per_history: int = 10

    def replace(self, **kw) -> "BertVariantConfig":
        return dataclasses.replace(self, **kw)


# per-variant table; special ids mirror reference utils/Manager.py:953-1001,
# lengths utils/Manager.py:1013-1026, surgery models/PLM.py:19-84
_VARIANTS = {
    "bert": BertVariantConfig(),
    "newsbert": BertVariantConfig(num_layers=4),
    "distill": BertVariantConfig(num_layers=6, type_vocab_size=0,
                                 pooler="gelu_cls"),
    "deberta": BertVariantConfig(pooler="gelu_cls", cls_token_id=1,
                                 sep_token_id=2,
                                 attention_type="disentangled",
                                 pos_att_types=("c2p", "p2c"),
                                 position_biased_input=False,
                                 type_vocab_size=0),
    # funnel: the pooling-pyramid encoder (funnel-transformer/small's
    # B4-4-4 layout, reference models/PLM.py:30-35) — layers split into
    # pool_blocks blocks with stride-2 CLS-preserving mean pooling
    # between blocks; identity pooler
    # (no token-type table: HF funnel's embeddings are word + LayerNorm
    # only — segments live inside its attention as seg_embed, unused for
    # single-segment news titles)
    "funnel": BertVariantConfig(num_layers=6, pooler="cls",
                                pool_blocks=3, type_vocab_size=0),
    "synthesizer": BertVariantConfig(attention_type="synthesizer"),
    "longformer": BertVariantConfig(attention_type="local", window=32,
                                    max_position=1026, pad_token_id=1,
                                    cls_token_id=0, sep_token_id=2,
                                    type_vocab_size=1, max_length=1024,
                                    max_length_per_history=21),
    # bigbird: sliding window of 3 blocks + global first block + per-head
    # STATIC random blocks (BigBird paper / reference models/PLM.py:66-78
    # BigBirdConfig(block_size=64, num_random_blocks=3)); the random
    # pattern is a deterministic trace-time constant so the program stays
    # one compiled executable
    "bigbird": BertVariantConfig(attention_type="bigbird", block_size=64,
                                 num_random_blocks=3,
                                 max_position=1024, cls_token_id=65,
                                 sep_token_id=66, max_length=1024,
                                 max_length_per_history=21),
    # reformer: alternating chunked-local / LSH layers with shared-QK
    # (google/reformer-crime-and-punishment attn_layers pattern,
    # reference models/PLM.py:66-78, checkpoint named at
    # utils/Manager.py:926); chunk 64, one look-back/ahead chunk; the
    # projection/FFN dims mirror the checkpoint (2 heads × head_size 64
    # → 128-wide q/k/v, feed_forward_size 512) so its tensors map
    # shape-exactly in load_hf_reformer_weights; axial position
    # embeddings factor the 1280-position table as (40, 32) rows ×
    # (64, 192)-dim halves (HF axial_pos_embds_dim layout — SURVEY §5.7;
    # (40, 32) is the shape the reference pins for its own from-scratch
    # XFormer reformer, models/XFormer.py:20-22)
    "reformer": BertVariantConfig(hidden_size=256, num_layers=6,
                                  num_heads=2, attention_head_size=64,
                                  intermediate_size=512,
                                  attention_layers=("chunked", "lsh"),
                                  chunk_size=64, num_buckets=32,
                                  max_position=1280, pad_token_id=2,
                                  cls_token_id=1, sep_token_id=2,
                                  pooler="cls", max_length=1280,
                                  max_length_per_history=26,
                                  type_vocab_size=0,
                                  axial_pos_shape=(40, 32)),
}


def bert_variant(name: str, *, vocab_size: Optional[int] = None,
                 signal_length: int = 30, num_layers: Optional[int] = None
                 ) -> BertVariantConfig:
    if name not in _VARIANTS:
        raise ValueError(f"unknown PLM variant {name}")
    cfg = _VARIANTS[name]
    kw = {"signal_length": signal_length}
    if vocab_size is not None:
        kw["vocab_size"] = vocab_size
    if num_layers is not None:
        kw["num_layers"] = num_layers
    return cfg.replace(**kw)


def _bigbird_block_pattern(S: int, block: int, n_rand: int, n_heads: int,
                           seed: int):
    """Static per-head BigBird block pattern → [n_heads, nb, nb] bool.

    Sliding window of 3 blocks + global first block (both directions) +
    ``n_rand`` random non-window blocks per (head, query-block), drawn
    with a deterministic seed at trace time (BigBird paper §3;
    reference models/PLM.py:66-78 builds BigBirdConfig(block_size=64,
    num_random_blocks=3)). Static so one executable serves every step.
    """
    import numpy as np
    nb = -(-S // block)
    idx = np.arange(nb)
    keep = np.broadcast_to(
        (np.abs(idx[:, None] - idx[None, :]) <= 1)
        | (idx[:, None] == 0) | (idx[None, :] == 0),
        (n_heads, nb, nb)).copy()
    rng = np.random.default_rng(seed + 1)
    for h in range(n_heads):
        for qb in range(1, nb):
            cand = idx[(np.abs(idx - qb) > 1) & (idx != 0)]
            if len(cand):
                pick = rng.choice(len(cand), size=min(n_rand, len(cand)),
                                  replace=False)
                keep[h, qb, cand[pick]] = True
    return keep


def _bigbird_selection(pattern):
    """Static per-(head, query-block) key-block selection lists from the
    [nh, nb, nb] bool pattern, for query blocks 1..nb-1 (block 0 is the
    global row — it attends every key and is computed densely).
    Returns (sel [nh, nb-1, NSEL] int32, valid [nh, nb-1, NSEL] bool);
    NSEL is the max selected-block count, short rows padded with dead
    slots that the validity mask kills."""
    import numpy as np
    nh, nb, _ = pattern.shape
    NSEL = int(pattern[:, 1:, :].sum(-1).max()) if nb > 1 else 0
    sel = np.zeros((nh, nb - 1, NSEL), np.int32)
    valid = np.zeros((nh, nb - 1, NSEL), bool)
    for h in range(nh):
        for qb in range(1, nb):
            idx = np.nonzero(pattern[h, qb])[0]
            sel[h, qb - 1, :len(idx)] = idx
            valid[h, qb - 1, :len(idx)] = True
    return sel, valid


def bigbird_block_sparse_attention(q: jnp.ndarray, k: jnp.ndarray,
                                   v: jnp.ndarray, key_mask: jnp.ndarray,
                                   pattern, block: int,
                                   prob_dropout=None) -> jnp.ndarray:
    """BigBird attention executed SPARSELY: each query block gathers
    only its pattern's {sliding, global, random} key blocks.

    The dense-mask formulation materializes [B, nh, S, S] score/prob
    tensors and pays O(S²) matmul FLOPs even though only ~NSEL·block of
    S key columns per query block are live; here k/v are gathered per
    (head, query block) with a static index (one executable per shape),
    so score/PV work is O(S · NSEL · block) and no S×S tensor exists.
    Query block 0 (the global row — it attends everything) runs densely
    over all keys. Exactly equals the dense masked formulation
    (tests/test_sparse_attention.py::test_bigbird_sparse_matches_dense).
    The reference gets this from HF BigBird's block-sparse kernels
    (reference models/PLM.py:66-78, BigBirdConfig(block_size=64)).

    q/k/v [B, nh, S, hd]; key_mask [B, S]; pattern [nh, nb, nb] bool
    (static numpy); S is padded to a block multiple internally.
    ``prob_dropout`` (optional callable) is applied to each probability
    tensor — iid per-element dropout, distributionally identical to the
    dense path's dropout (masked columns carry zero probability).
    """
    import numpy as np
    B, nh, S, hd = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, q.dtype))
    nb = pattern.shape[1]
    Sp = nb * block
    if Sp != S:
        zc = ((0, 0), (0, 0), (0, Sp - S), (0, 0))
        q, k, v = jnp.pad(q, zc), jnp.pad(k, zc), jnp.pad(v, zc)
        key_mask = jnp.pad(key_mask, ((0, 0), (0, Sp - S)))
    sel, selvalid = _bigbird_selection(np.asarray(pattern, bool))
    NSEL = sel.shape[-1]
    kb = k.reshape(B, nh, nb, block, hd)
    vb = v.reshape(B, nh, nb, block, hd)
    selj = jnp.asarray(sel)                           # [nh, nbq, NSEL]
    h_idx = jnp.arange(nh)[:, None, None]
    k_sel = kb[:, h_idx, selj]          # [B, nh, nbq, NSEL, block, hd]
    v_sel = vb[:, h_idx, selj]
    kmb = key_mask.reshape(B, nb, block)
    am_sel = kmb[:, selj]                   # [B, nh, nbq, NSEL, block]
    colmask = (am_sel *
               jnp.asarray(selvalid, key_mask.dtype)[None, :, :, :, None])
    colmask = colmask.reshape(B, nh, nb - 1, 1, NSEL * block)
    qq = q.reshape(B, nh, nb, block, hd)
    scores = jnp.einsum(
        "bhnqd,bhnkd->bhnqk", qq[:, :, 1:],
        k_sel.reshape(B, nh, nb - 1, NSEL * block, hd)) * scale
    probs = masked_softmax(scores, colmask)
    if prob_dropout is not None:
        probs = prob_dropout(probs)
    out_sp = jnp.einsum(
        "bhnqk,bhnkd->bhnqd", probs,
        v_sel.reshape(B, nh, nb - 1, NSEL * block, hd))
    # global query block 0: dense over all keys (pattern row 0 is all
    # ones by construction — tests/test_sparse_attention.py)
    s0 = jnp.einsum("bhqd,bhkd->bhqk", qq[:, :, 0], k) * scale
    p0 = masked_softmax(s0, key_mask[:, None, None, :])
    if prob_dropout is not None:
        p0 = prob_dropout(p0)
    out0 = jnp.einsum("bhqk,bhkd->bhqd", p0, v)
    out = jnp.concatenate([out0[:, :, None], out_sp], axis=2)
    return out.reshape(B, nh, Sp, hd)[:, :, :S]


def _chunk_neighbors(x: jnp.ndarray) -> jnp.ndarray:
    """[..., nc, c, d] → [..., nc, 3c, d]: previous|self|next chunk
    (zero-padded at the edges, non-wrapping)."""
    pad = [(0, 0)] * (x.ndim - 3)
    prev = jnp.pad(x[..., :-1, :, :], pad + [(1, 0), (0, 0), (0, 0)])
    nxt = jnp.pad(x[..., 1:, :, :], pad + [(0, 1), (0, 0), (0, 0)])
    return jnp.concatenate([prev, x, nxt], axis=-2)


def _pad_to_chunks(t: jnp.ndarray, c: int, axis: int) -> jnp.ndarray:
    S = t.shape[axis]
    pad = (-S) % c
    if pad == 0:
        return t
    widths = [(0, 0)] * t.ndim
    widths[axis] = (0, pad)
    return jnp.pad(t, widths)


def chunked_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      key_mask: jnp.ndarray, chunk: int,
                      extra_key_mask: Optional[jnp.ndarray] = None,
                      self_penalty: bool = False,
                      positions: Optional[jnp.ndarray] = None
                      ) -> jnp.ndarray:
    """Chunked local attention: each query chunk attends to its own and
    both adjacent key chunks (Reformer LocalSelfAttention semantics,
    chunk look-back/ahead 1). q/k/v [B, h, S, d]; key_mask [B, h, S] (or
    broadcastable); O(S·3c) scores. With ``self_penalty`` (LSH shared-QK
    layers) a query's own position scores -1e5 so it is used only when
    nothing else is available (HF Reformer's mask_self trick)."""
    B, h, S, d = q.shape
    qc = _pad_to_chunks(q, chunk, 2)
    kc = _pad_to_chunks(k, chunk, 2)
    vc = _pad_to_chunks(v, chunk, 2)
    mc = _pad_to_chunks(jnp.broadcast_to(key_mask, (B, h, S)), chunk, 2)
    Sp = qc.shape[2]
    nc = Sp // chunk
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(Sp), (B, h, Sp))
    else:
        positions = _pad_to_chunks(
            jnp.broadcast_to(positions, (B, h, S)), chunk, 2)

    def chunks(t):
        return t.reshape(*t.shape[:2], nc, chunk, *t.shape[3:])

    qc = chunks(qc)
    k3 = _chunk_neighbors(chunks(kc))
    v3 = _chunk_neighbors(chunks(vc))
    m3 = _chunk_neighbors(chunks(mc)[..., None])[..., 0]      # [B,h,nc,3c]
    p_q = chunks(positions)                                   # [B,h,nc,c]
    p_k = _chunk_neighbors(chunks(positions)[..., None])[..., 0]
    # zero-padded neighbor chunks at the edges must not be mistaken for
    # real position 0 keys: pad-edge entries have mask 0 already
    scores = jnp.einsum("bhncd,bhnkd->bhnck", qc, k3) / jnp.sqrt(
        jnp.asarray(d, q.dtype))
    if self_penalty:
        self_pair = p_q[..., :, None] == p_k[..., None, :]
        scores = jnp.where(self_pair, scores - 1e5, scores)
    mask = m3[..., None, :]                                   # [B,h,nc,1,3c]
    if extra_key_mask is not None:
        mask = mask * extra_key_mask
    probs = masked_softmax(scores, mask)
    out = jnp.einsum("bhnck,bhnkd->bhncd", probs, v3)
    return out.reshape(B, h, Sp, d)[:, :, :S]


def lsh_attention(qk: jnp.ndarray, v: jnp.ndarray, key_mask: jnp.ndarray,
                  chunk: int, num_buckets: int, seed: int) -> jnp.ndarray:
    """Single-round LSH attention with shared QK (Reformer paper §3 /
    google/reformer-crime-and-punishment's lsh layers, reference
    models/PLM.py:66-78).

    Buckets come from argmax over random rotations [xR; -xR] (the
    rotation matrix is a deterministic trace-time constant), tokens are
    stably sorted by (bucket, position), attention runs chunked over the
    sorted order restricted to same-bucket pairs (adjacent chunk
    look-back/ahead catches bucket spill), keys are the L2-normalized
    queries, self-pairs are soft-masked, and outputs are scattered back
    to the original order. Exactness of the sort/gather plumbing is
    pinned by tests/test_sparse_attention.py against a dense mask built
    from the same buckets.
    """
    import numpy as np
    B, h, S, d = qk.shape
    rot_np = np.random.default_rng(seed + 17).standard_normal(
        (d, num_buckets // 2)).astype(np.float32)
    rot = jnp.asarray(rot_np, qk.dtype)
    rotated = jnp.einsum("bhsd,dr->bhsr", qk, rot)
    buckets = jnp.argmax(
        jnp.concatenate([rotated, -rotated], axis=-1), axis=-1)  # [B,h,S]
    km = jnp.broadcast_to(key_mask, (B, h, S))
    # padding tokens sort to the end in their own bucket
    buckets = jnp.where(km > 0, buckets, num_buckets)

    pos = jnp.broadcast_to(jnp.arange(S), (B, h, S))
    order = jnp.argsort(buckets * (S + 1) + pos, axis=-1)     # stable
    take = lambda t: jnp.take_along_axis(t, order, axis=-1)
    qs = jnp.take_along_axis(qk, order[..., None], axis=2)
    vs = jnp.take_along_axis(v, order[..., None], axis=2)
    bs = take(buckets)
    ms = take(km)
    ps = take(pos)

    # shared-QK: keys are the normalized queries (Reformer §3)
    ks = qs / (jnp.linalg.norm(qs.astype(jnp.float32), axis=-1,
                               keepdims=True) + 1e-6).astype(qs.dtype)
    # same-bucket restriction rides the chunked mask
    bq = _pad_to_chunks(bs, chunk, 2)
    nc = bq.shape[-1] // chunk
    bq = bq.reshape(B, h, nc, chunk)
    bk = _chunk_neighbors(bq[..., None])[..., 0]
    same_bucket = (bq[..., :, None] == bk[..., None, :]).astype(qk.dtype)
    out_sorted = chunked_attention(qs, ks, vs, ms, chunk,
                                   extra_key_mask=same_bucket,
                                   self_penalty=True, positions=ps)
    inv = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(out_sorted, inv[..., None], axis=2)


def funnel_pool(x: jnp.ndarray, attn_mask: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stride-2 CLS-preserving pooling between funnel blocks.

    Position 0 ([CLS]) passes through; the rest mean-pool in pairs
    (mask-weighted so padding never dilutes a real token); the pooled
    mask keeps a position iff either source position was valid. Used
    pool-query-only (Funnel-Transformer §2.2): each block's first layer
    attends these pooled queries against the UNPOOLED keys/values
    (BertModel passes kv=<unpooled>), and the residual adds the pooled
    input — h ← LayerNorm(pool(h) + Attn(pool(h), h, h))."""
    B, S, H = x.shape
    cls_x, cls_m = x[:, :1], attn_mask[:, :1]
    rest_x, rest_m = x[:, 1:], attn_mask[:, 1:]
    pad = (-(S - 1)) % 2
    if pad:
        rest_x = jnp.pad(rest_x, ((0, 0), (0, pad), (0, 0)))
        rest_m = jnp.pad(rest_m, ((0, 0), (0, pad)))
    P = rest_x.shape[1] // 2
    rx = rest_x.reshape(B, P, 2, H)
    rm = rest_m.reshape(B, P, 2)
    denom = jnp.maximum(rm.sum(-1, keepdims=True), 1.0)
    pooled = (rx * rm[..., None]).sum(2) / denom
    pooled_m = (rm.sum(-1) > 0).astype(attn_mask.dtype)
    return (jnp.concatenate([cls_x, pooled], axis=1),
            jnp.concatenate([cls_m, pooled_m], axis=1))


def _local_global_band(mask: jnp.ndarray, window: int) -> jnp.ndarray:
    """[B, S] keep-mask → [B, S, S] windowed mask with a global position 0.

    keep (i, j) iff |i-j| <= window or i==0 or j==0, and j is a valid key.
    """
    S = mask.shape[-1]
    idx = jnp.arange(S)
    band = (jnp.abs(idx[:, None] - idx[None, :]) <= window)
    glob = (idx[:, None] == 0) | (idx[None, :] == 0)
    pattern = (band | glob).astype(mask.dtype)
    return pattern[None, :, :] * mask[:, None, :]


class _DisentangledSelfAttention(nn.Module):
    """DeBERTa v1 disentangled attention (reference models/PLM.py:19-28
    selects microsoft/deberta-base via HF AutoModel; the math here matches
    transformers' DisentangledSelfAttention exactly — pinned by
    tests/test_hf_parity.py::test_deberta_matches_transformers).

    Score(i,j) = [q_i·k_j  (content→content)
                  + q_i·K_r(δ(i,j))            ("c2p", content→position)
                  + k_j·Q_r(δ(i,j))            ("p2c", position→content)]
    with q and Q_r pre-scaled by 1/sqrt(d·(1+#components)), relative
    distance δ(i,j) = clamp(i-j, -span, span-1) indexing a table of
    2·span rel embeddings shared across layers, per-layer projections
    K_r = pos_proj(rel) (no bias) and Q_r = pos_q_proj(rel) (bias).
    Q/K/V come from one fused in_proj (no bias) with separate q/v bias
    vectors (k stays bias-free).
    """
    cfg: BertVariantConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask: jnp.ndarray,
                 rel_emb: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        c = self.cfg
        B, S, H = x.shape
        nh = c.num_heads
        hd = H // nh
        max_rel = c.max_relative or c.max_position
        span = min(S, max_rel)

        qkv = nn.Dense(3 * H, use_bias=False, dtype=self.dtype,
                       name="in_proj")(x)
        # per-head [q|k|v] interleaving, matching HF's chunk(3, dim=-1)
        # applied after the head split
        qkv = qkv.reshape(B, S, nh, 3, hd)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        q_bias = self.param("q_bias", nn.initializers.zeros, (H,),
                            jnp.float32)
        v_bias = self.param("v_bias", nn.initializers.zeros, (H,),
                            jnp.float32)
        q = q + q_bias.reshape(nh, hd).astype(self.dtype)
        v = v + v_bias.reshape(nh, hd).astype(self.dtype)
        q = q.transpose(0, 2, 1, 3)  # [B, nh, S, hd]
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        scale = jnp.sqrt(jnp.asarray(hd * (1 + len(c.pos_att_types)),
                                     jnp.float32)).astype(self.dtype)
        q = q / scale
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)

        if c.pos_att_types:
            # shared rel table sliced to the active span, with the same
            # dropout the content path applies to hidden states
            rel = rel_emb[max_rel - span: max_rel + span].astype(self.dtype)
            rel = nn.Dropout(c.hidden_dropout,
                             deterministic=deterministic)(rel)
            idx = jnp.arange(S)
            # δ(i,j)+span, clamped into the table — used by BOTH
            # components (p2c's gather+transpose works out to the same
            # (i-j)-indexed lookup on k_j)
            rel_idx = jnp.clip(idx[:, None] - idx[None, :] + span,
                               0, 2 * span - 1)              # [S, S]
            if "c2p" in c.pos_att_types:
                pos_k = nn.Dense(H, use_bias=False, dtype=self.dtype,
                                 name="pos_proj")(rel)       # [2span, H]
                pos_k = pos_k.reshape(2 * span, nh, hd)
                c2p = jnp.einsum("bhqd,rhd->bhqr", q, pos_k)
                scores = scores + jnp.take_along_axis(
                    c2p, rel_idx[None, None, :, :], axis=-1)
            if "p2c" in c.pos_att_types:
                pos_q = nn.Dense(H, dtype=self.dtype, name="pos_q_proj")(
                    rel) / scale                              # [2span, H]
                pos_q = pos_q.reshape(2 * span, nh, hd)
                p2c = jnp.einsum("bhkd,rhd->bhkr", k, pos_q)  # over keys
                # score_p2c[i,j] = k_j · Q_r(clamp(i-j)+span):
                # gather over r at rel_idx[i,j], applied on the key axis
                scores = scores + jnp.take_along_axis(
                    p2c, rel_idx.T[None, None, :, :], axis=-1
                ).transpose(0, 1, 3, 2)

        # HF masks BOTH sides (m_i · m_j); fully-masked query rows give
        # all-zero probs here (uniform in HF — positions are padding
        # either way and never read downstream)
        mask2d = (attn_mask[:, None, :, None] * attn_mask[:, None, None, :])
        probs = masked_softmax(scores, mask2d)
        probs = nn.Dropout(c.attention_dropout,
                           deterministic=deterministic)(probs)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return out.transpose(0, 2, 1, 3).reshape(B, S, H)


class _SelfAttention(nn.Module):
    cfg: BertVariantConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask: jnp.ndarray,
                 deterministic: bool = True,
                 kv: Optional[jnp.ndarray] = None,
                 kv_mask: Optional[jnp.ndarray] = None,
                 flat_dims: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
        c = self.cfg
        if flat_dims is not None:
            # 2-D residual-stream fast path (BertModel flattens once for
            # all-full-attention variants): x is [B·S, H] — projections
            # and the fused kernel consume it natively, so no 3-D↔2-D
            # relayout exists anywhere in the layer (measured ~13 ms/step
            # of reshape/copy churn at newsbert bench shapes otherwise)
            B, S = flat_dims
            H = x.shape[-1]
            assert c.attention_type == "full" and kv is None
            q = nn.Dense(H, dtype=self.dtype, name="query")(x)
            k = nn.Dense(H, dtype=self.dtype, name="key")(x)
            v = nn.Dense(H, dtype=self.dtype, name="value")(x)
            from ..ops.pallas_mhsa import short_mhsa
            p_drop = (0.0 if deterministic
                      else float(c.attention_dropout))
            rng = self.make_rng("dropout") if p_drop > 0.0 else None
            return short_mhsa(q, k, v, attn_mask, c.num_heads,
                              p_drop=p_drop, dropout_rng=rng, seq_len=S)
        B, S, H = x.shape
        if kv is not None:
            # cross-length attention (funnel pool-query-only boundary):
            # only the dense "full" score path supports it
            assert c.attention_type == "full", \
                f"kv unsupported for attention_type {c.attention_type}"
        if c.attention_type == "synthesizer":
            # dense synthesizer: value projection then an MLP over the
            # feature axis produces the [S, S] mixing matrix directly
            # (reference models/Modules/Synthesizer.py:41-52; unmasked
            # softmax like the reference)
            v = nn.Dense(H, dtype=self.dtype, name="value")(x)
            scores = nn.Dense(c.signal_length, dtype=self.dtype,
                              name="score_out")(
                nn.relu(nn.Dense(c.signal_length, dtype=self.dtype,
                                 name="score_in")(v)))
            probs = nn.softmax(scores, axis=-1)
            return probs @ v

        head_dim = c.attention_head_size or H // c.num_heads
        A = head_dim * c.num_heads    # projection width (== H except
                                      # when attention_head_size is set)

        def heads(t):
            return t.reshape(B, t.shape[1], c.num_heads,
                             head_dim).transpose(0, 2, 1, 3)

        if c.attention_type == "lsh":
            # Reformer LSH layer: shared QK (one projection serves both,
            # keys are normalized queries inside lsh_attention)
            qk = heads(nn.Dense(A, use_bias=False, dtype=self.dtype,
                                name="query_key")(x))
            v = heads(nn.Dense(A, dtype=self.dtype, name="value")(x))
            out = lsh_attention(qk, v, attn_mask[:, None, :],
                                c.chunk_size or 64, c.num_buckets,
                                seed=c.layer_seed)
            return out.transpose(0, 2, 1, 3).reshape(B, S, A)

        kv_src = x if kv is None else kv
        key_mask = attn_mask if kv_mask is None else kv_mask
        q = nn.Dense(A, dtype=self.dtype, name="query")(x)
        k = nn.Dense(A, dtype=self.dtype, name="key")(kv_src)
        v = nn.Dense(A, dtype=self.dtype, name="value")(kv_src)

        if c.attention_type == "full" and kv is None and S <= 64 \
                and A == H:
            # short-article regime (the PLM news tower, S=30): the fused
            # Pallas MHSA kernel keeps q/k/v in [B, S, H] layout (no
            # head-split transposes), packs articles into MXU-aligned
            # block-diagonal score matmuls, and fuses masked softmax +
            # prob dropout in VMEM — measured ~46 ms/step of unfused XLA
            # attention work at newsbert bench shapes (ops/pallas_mhsa.py)
            import jax as _jax

            from ..ops.pallas_mhsa import mhsa_plan, short_mhsa
            if (_jax.default_backend() in ("tpu", "axon")
                    and mhsa_plan(S, H, c.num_heads, 16) is not None):
                p_drop = 0.0 if deterministic else float(c.attention_dropout)
                rng = (self.make_rng("dropout") if p_drop > 0.0 else None)
                return short_mhsa(q, k, v, attn_mask, c.num_heads,
                                  p_drop=p_drop, dropout_rng=rng)

        if c.attention_type == "bigbird" and kv is None and A == H:
            # long-sequence fast path on UNSPLIT [B, S, H] q/k/v: the
            # fused Pallas kernel executes the per-head pattern with
            # zero gathers (k/v VMEM-resident; random blocks are
            # dynamic 64-aligned slices) and no head split/merge
            # transposes. The XLA gather realization below measured
            # SLOWER than dense masked attention on the v5e (374 vs
            # 280 ms/step — duplicated key movement + small matmuls);
            # the kernel avoids both. Attention dropout is skipped here
            # like the banded path. CPU/short sequences fall through.
            from ..ops.pallas_attention import (
                banded_mhsa_plan, bigbird_mhsa,
            )
            block = c.block_size or 64
            if (S // block >= 8 and S % block == 0 and _tpu_backend()
                    and banded_mhsa_plan(S, H, c.num_heads) is not None):
                pattern = _bigbird_block_pattern(
                    S, block, c.num_random_blocks, c.num_heads,
                    c.layer_seed)
                return bigbird_mhsa(q, k, v, attn_mask, c.num_heads,
                                    pattern, block)

        if use_banded_mhsa(c.attention_type, c.window, S, kv is not None,
                           A, H, c.num_heads):
            # long-sequence path on UNSPLIT [B, S, H] q/k/v: the
            # full-width lane-masked banded kernel keeps the natural
            # layout (no head split/merge transposes — ~24 ms/step of
            # copies at XFormer bench shapes) and runs (B, H/128) fat
            # grid cells instead of (B·heads) thin [S, 64] ones
            # (BASELINE.md round-4 XFormer ledger). Attention dropout is
            # skipped on the band like the per-head path below.
            from ..ops.pallas_attention import banded_mhsa
            return banded_mhsa(q, k, v, attn_mask, c.num_heads,
                               c.window)

        q, k, v = heads(q), heads(k), heads(v)

        if c.attention_type == "chunked":
            # Reformer local layer: chunked attention, look-back/ahead 1
            out = chunked_attention(q, k, v, attn_mask[:, None, :],
                                    c.chunk_size or 64)
            return out.transpose(0, 2, 1, 3).reshape(B, S, A)
        if c.attention_type == "bigbird":
            block = c.block_size or 64
            pattern = _bigbird_block_pattern(S, block, c.num_random_blocks,
                                             c.num_heads, c.layer_seed)
            drop = nn.Dropout(c.attention_dropout,
                              deterministic=deterministic)
            if pattern.shape[1] >= 8 and not _tpu_backend():
                # long-sequence regime OFF-TPU: gather each query
                # block's key blocks instead of materializing
                # [B, nh, S, S] scores (no S² memory on CPU). On TPU
                # this realization measured SLOWER than dense (374 vs
                # 280 ms/step — BASELINE.md round 5), so a TPU config
                # that misses the kernel guard above (odd S, A != H,
                # unplannable heads) takes the dense branch below
                out = bigbird_block_sparse_attention(
                    q, k, v, attn_mask, pattern, block, prob_dropout=drop)
                return out.transpose(0, 2, 1, 3).reshape(B, S, H)
            # short-sequence regime (the PLM news tower, nb ≤ a few):
            # nearly every block is selected — dense masked attention
            # with the expanded block map is cheaper than gathering
            pat = jnp.asarray(pattern, self.dtype)
            pat = jnp.repeat(jnp.repeat(pat, block, axis=1), block,
                             axis=2)[:, :S, :S]
            mask = pat[None] * attn_mask[:, None, None, :]
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
                jnp.asarray(head_dim, self.dtype))
            probs = masked_softmax(scores, mask)
            probs = drop(probs)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
            return out.transpose(0, 2, 1, 3).reshape(B, S, H)
        if c.attention_type == "full":
            # flatten (batch, heads) for the score/context matmuls: fewer
            # 4-D layout transitions around the prob-dropout tensors
            # (~2.5%/step on the newsbert v5e profile)
            z = B * c.num_heads
            Sq, Sk = q.shape[2], k.shape[2]
            qf = q.reshape(z, Sq, head_dim)
            kf = k.reshape(z, Sk, head_dim)
            vf = v.reshape(z, Sk, head_dim)
            scores = jnp.einsum("zqd,zkd->zqk", qf, kf) / jnp.sqrt(
                jnp.asarray(head_dim, self.dtype))
            mask = jnp.broadcast_to(
                key_mask[:, None, None, :],
                (B, c.num_heads, Sq, Sk)).reshape(z, Sq, Sk)
            probs = masked_softmax(scores, mask)
            probs = nn.Dropout(c.attention_dropout,
                               deterministic=deterministic)(probs)
            out = jnp.einsum("zqk,zkd->zqd", probs, vf)
            return out.reshape(B, c.num_heads, Sq, head_dim).transpose(
                0, 2, 1, 3).reshape(B, Sq, H)
        if c.attention_type == "local" and c.window > 0 and S > 256:
            # long-sequence path: exact block-banded attention, O(S·BS)
            # scores instead of O(S²) (ops/local_attention.py). Attention
            # dropout is skipped here — the long variants are the XFormer
            # family whose reference analogues use sparse kernels without
            # probability dropout on the band.
            # fused Pallas kernel on TPU, XLA block-banded elsewhere
            from ..ops.pallas_attention import local_global_attention
            out = local_global_attention(q, k, v, attn_mask, c.window)
            return out.transpose(0, 2, 1, 3).reshape(B, S, H)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(head_dim, self.dtype))
        if c.attention_type == "local" and c.window > 0:
            mask = _local_global_band(attn_mask, c.window)[:, None, :, :]
        else:
            mask = attn_mask[:, None, None, :]
        probs = masked_softmax(scores, mask)
        probs = nn.Dropout(c.attention_dropout,
                           deterministic=deterministic)(probs)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return out.transpose(0, 2, 1, 3).reshape(B, S, H)


class _ResidualNorm(nn.Module):
    """``LayerNorm(x + dropout(res))`` with the same param tree as
    nn.LayerNorm (scale/bias, f32) — the 2-D stream's layers use the
    fused Pallas residual+LN kernel on TPU (ops/pallas_ln.py; XLA's LN
    fusions run at ~90 GB/s on the v5e, the kernel at the streaming
    rate). With ``p_drop`` > 0 the sublayer's hidden dropout runs
    in-kernel from the hardware PRNG, eliminating the separate
    nn.Dropout pass over the [N, H] stream."""
    eps: float
    dtype: jnp.dtype = jnp.float32
    p_drop: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, res: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        H = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (H,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (H,), jnp.float32)
        from ..ops.pallas_ln import fused_add_ln
        p = 0.0 if deterministic else float(self.p_drop)
        rng = self.make_rng("dropout") if p > 0.0 else None
        return fused_add_ln(x, res, scale, bias, eps=self.eps,
                            p_drop=p, dropout_rng=rng)


class _Layer(nn.Module):
    cfg: BertVariantConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask: jnp.ndarray,
                 deterministic: bool = True,
                 rel_emb: Optional[jnp.ndarray] = None,
                 kv: Optional[jnp.ndarray] = None,
                 kv_mask: Optional[jnp.ndarray] = None,
                 flat_dims: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
        """kv/kv_mask: separate key/value sequence for funnel's
        pool-query-only boundary layers (queries/residual come from the
        pooled ``x``; keys/values from the unpooled ``kv``).
        flat_dims: (B, S) when x rides the 2-D [B·S, H] residual stream
        (the LN/FFN/residual ops below are per-token and rank-agnostic)."""
        c = self.cfg
        if c.attention_type == "disentangled":
            attn = _DisentangledSelfAttention(c, self.dtype,
                                              name="attention")(
                x, attn_mask, rel_emb, deterministic)
        else:
            attn = _SelfAttention(c, self.dtype, name="attention")(
                x, attn_mask, deterministic, kv=kv, kv_mask=kv_mask,
                flat_dims=flat_dims)
        attn = nn.Dense(c.hidden_size, dtype=self.dtype, name="attn_out")(attn)

        def res_norm(name, x_in, res):
            """Fused dropout+residual+LN (same scale/bias param tree as
            nn.LayerNorm). The kernel consumes [N, H]; 3-D activations
            ride through free contiguous reshapes — this is how the
            long-context (XFormer) family reaches the Pallas LN kernels,
            not just the 2-D short-article stream."""
            rn = _ResidualNorm(c.eps, self.dtype, p_drop=c.hidden_dropout,
                               name=name)
            if x_in.ndim == 2:
                return rn(x_in, res, deterministic)
            B2, S2, H2 = x_in.shape
            out = rn(x_in.reshape(B2 * S2, H2), res.reshape(B2 * S2, H2),
                     deterministic)
            return out.reshape(B2, S2, H2)

        x = res_norm("attn_norm", x, attn)
        ff = nn.gelu(nn.Dense(c.intermediate_size, dtype=self.dtype,
                              name="ffn_in")(x))
        ff = nn.Dense(c.hidden_size, dtype=self.dtype, name="ffn_out")(ff)
        return res_norm("ffn_norm", x, ff)


class BertModel(nn.Module):
    """Token ids [B, S] + mask [B, S] → (hidden [B, S, H], pooled [B, H])."""
    cfg: BertVariantConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attn_mask: jnp.ndarray,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        S = input_ids.shape[-1]
        emb = nn.Embed(c.vocab_size, c.hidden_size,
                       embedding_init=nn.initializers.normal(0.02),
                       dtype=self.dtype, name="word_embeddings")(input_ids)
        if c.position_biased_input and c.axial_pos_shape:
            # Reformer axial position embeddings (HF
            # AxialPositionEmbeddings; reference models/PLM.py:66-78's
            # checkpoint): the [s0*s1, H] table factors as two small
            # tables — position p = i0*s1 + i1 reads
            # concat(w0[i0], w1[i1]) — s0·d0 + s1·d1 parameters instead
            # of s0·s1·H. Param shapes mirror HF's weights.0/.1 layout.
            s0, s1 = c.axial_pos_shape
            if c.axial_pos_dims:
                d0, d1 = c.axial_pos_dims
            else:
                d0 = c.hidden_size // 4
                d1 = c.hidden_size - d0
            ax0 = self.param("axial_pos_0", nn.initializers.normal(0.02),
                             (s0, 1, d0), jnp.float32)
            ax1 = self.param("axial_pos_1", nn.initializers.normal(0.02),
                             (1, s1, d1), jnp.float32)
            full = jnp.concatenate(
                [jnp.broadcast_to(ax0, (s0, s1, d0)),
                 jnp.broadcast_to(ax1, (s0, s1, d1))],
                axis=-1).reshape(s0 * s1, c.hidden_size)
            emb = emb + full[:S][None, :, :].astype(self.dtype)
        elif c.position_biased_input:
            pos = self.param("position_embeddings",
                             nn.initializers.normal(0.02),
                             (c.max_position, c.hidden_size), jnp.float32)
            emb = emb + pos[:S][None, :, :].astype(self.dtype)
        if c.type_vocab_size:
            tt = self.param("token_type_embeddings",
                            nn.initializers.normal(0.02),
                            (c.type_vocab_size, c.hidden_size), jnp.float32)
            emb = emb + tt[0][None, None, :].astype(self.dtype)
        x = nn.LayerNorm(epsilon=c.eps, dtype=self.dtype,
                         name="embed_norm")(emb)
        attn_mask = attn_mask.astype(self.dtype)
        rel_emb = None
        if c.attention_type == "disentangled":
            # DeBERTa zeroes padded input positions and shares one
            # relative-distance table across every layer
            x = x * attn_mask[..., None]
            max_rel = c.max_relative or c.max_position
            rel_emb = self.param("rel_embeddings",
                                 nn.initializers.normal(0.02),
                                 (2 * max_rel, c.hidden_size), jnp.float32)
        x = nn.Dropout(c.hidden_dropout, deterministic=deterministic)(x)
        # funnel: pool the sequence (stride 2, CLS-preserving) at block
        # boundaries — layers split as evenly as possible into
        # pool_blocks blocks (funnel-transformer/small's Bx-x-x pyramid)
        pool_at = set()
        if c.pool_blocks > 1:
            pool_at = {round(c.num_layers * b / c.pool_blocks)
                       for b in range(1, c.pool_blocks)}
        # all-full-attention variants (bert/newsbert/distill) ride a 2-D
        # [B·S, H] residual stream: every op in a layer is per-token
        # except attention, and the fused short-MHSA kernel consumes the
        # flat layout natively — no head transposes and no 3-D↔2-D
        # relayouts anywhere in the encoder body
        flat2d = (c.attention_type == "full" and not c.attention_layers
                  and not pool_at and S <= 64)
        B = x.shape[0]
        if flat2d:
            x = x.reshape(B * S, c.hidden_size)
        for i in range(c.num_layers):
            lc = c
            if c.attention_layers:
                lc = c.replace(attention_type=c.attention_layers[
                    i % len(c.attention_layers)], layer_seed=i)
            elif c.attention_type in ("bigbird", "lsh"):
                lc = c.replace(layer_seed=i)
            if i in pool_at:
                # pool-query-only (Funnel-Transformer §2.2): the block's
                # first layer attends pooled queries → UNPOOLED keys/
                # values — h ← LayerNorm(pool(h) + Attn(pool(h), h, h))
                # — so no information is discarded before the attention
                # that compresses it
                pooled_x, pooled_mask = funnel_pool(x, attn_mask)
                x = _Layer(lc, self.dtype, name=f"layer_{i}")(
                    pooled_x, pooled_mask, deterministic, rel_emb=rel_emb,
                    kv=x, kv_mask=attn_mask)
                attn_mask = pooled_mask
            else:
                x = _Layer(lc, self.dtype, name=f"layer_{i}")(
                    x, attn_mask, deterministic, rel_emb=rel_emb,
                    flat_dims=(B, S) if flat2d else None)
        if flat2d:
            x = x.reshape(B, S, c.hidden_size)
        pooled = self._pool(x)
        return x, pooled

    def _pool(self, hidden: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        cls = hidden[:, 0]
        if c.pooler == "tanh":
            # standard BERT pooler (the reference's pooler_output path,
            # models/PLM.py:102-106)
            return jnp.tanh(nn.Dense(c.hidden_size, dtype=self.dtype,
                                     name="pooler")(cls))
        if c.pooler == "gelu_cls":
            # deberta/distill surgery (reference models/PLM.py:19-28, 49-57)
            return nn.gelu(nn.Dense(c.hidden_size, dtype=self.dtype,
                                    name="pooler")(cls))
        return cls  # funnel identity pooler (reference models/PLM.py:30-35)


def _hf_putter(hf_state_dict, params, prefix: str):
    """(state_dict, flax params) → (mutable tree, put, placed-counter).

    ``placed`` is a one-element list counting tensors actually planted, so
    callers can distinguish a real import from one where every tensor was
    silently skipped by the shape guard (e.g. width-mismatched checkpoint)."""
    import numpy as np

    sd = {k: np.asarray(v) for k, v in hf_state_dict.items()}
    p = flax_unfreeze(params)
    placed = [0]

    def put(tree_path, key, transpose=False):
        if prefix + key not in sd:
            return
        val = sd[prefix + key]
        if transpose:
            val = val.T
        node = p["params"]
        for part in tree_path[:-1]:
            # tolerate absent paths (strict=False semantics, reference
            # models/PLM.py:48): e.g. the synthesizer variant has no
            # query/key projections for BERT weights to land in
            if part not in node:
                return
            node = node[part]
        if tree_path[-1] in node:
            # keep random init on dimension mismatch (e.g. a checkpoint
            # saved at different widths) rather than planting a
            # wrong-shaped leaf that breaks apply() later
            if tuple(node[tree_path[-1]].shape) != tuple(val.shape):
                return
            node[tree_path[-1]] = jnp.asarray(val)
            placed[0] += 1

    return p, put, placed


def _put_common_layer(put, hf: str, fx: str) -> None:
    """attn-out + layernorms + FFN mapping shared by BERT and DeBERTa."""
    put([fx, "attn_out", "kernel"], hf + "attention.output.dense.weight",
        transpose=True)
    put([fx, "attn_out", "bias"], hf + "attention.output.dense.bias")
    put([fx, "attn_norm", "scale"], hf + "attention.output.LayerNorm.weight")
    put([fx, "attn_norm", "bias"], hf + "attention.output.LayerNorm.bias")
    put([fx, "ffn_in", "kernel"], hf + "intermediate.dense.weight",
        transpose=True)
    put([fx, "ffn_in", "bias"], hf + "intermediate.dense.bias")
    put([fx, "ffn_out", "kernel"], hf + "output.dense.weight",
        transpose=True)
    put([fx, "ffn_out", "bias"], hf + "output.dense.bias")
    put([fx, "ffn_norm", "scale"], hf + "output.LayerNorm.weight")
    put([fx, "ffn_norm", "bias"], hf + "output.LayerNorm.bias")


def load_hf_bert_weights(params, hf_state_dict, num_layers: int,
                         prefix: str = ""):
    """Map a HuggingFace bert-base state_dict onto BertModel params.

    Usable when a local HF cache exists (zero-egress environments train
    from random init). Returns a new params dict; unmatched entries keep
    their random init (strict=False semantics like the synthesizer load,
    reference models/PLM.py:48).
    """
    import numpy as np

    p, put, placed = _hf_putter(hf_state_dict, params, prefix)
    put(["word_embeddings", "embedding"], "embeddings.word_embeddings.weight")
    put(["position_embeddings"], "embeddings.position_embeddings.weight")
    put(["token_type_embeddings"], "embeddings.token_type_embeddings.weight")
    put(["embed_norm", "scale"], "embeddings.LayerNorm.weight")
    put(["embed_norm", "bias"], "embeddings.LayerNorm.bias")
    for i in range(num_layers):
        hf = f"encoder.layer.{i}."
        fx = f"layer_{i}"
        for ours, theirs in [("query", "attention.self.query"),
                             ("key", "attention.self.key"),
                             ("value", "attention.self.value")]:
            put([fx, "attention", ours, "kernel"], hf + theirs + ".weight",
                transpose=True)
            put([fx, "attention", ours, "bias"], hf + theirs + ".bias")
        _put_common_layer(put, hf, fx)
    put(["pooler", "kernel"], "pooler.dense.weight", transpose=True)
    put(["pooler", "bias"], "pooler.dense.bias")
    return p, placed[0]


def load_hf_deberta_weights(params, hf_state_dict, num_layers: int,
                            prefix: str = ""):
    """Map a HuggingFace DebertaModel state_dict onto BertModel params
    (deberta variant). HF's fused ``in_proj`` output layout (per-head
    [q|k|v] blocks) matches _DisentangledSelfAttention's reshape, so the
    kernel maps by plain transpose."""
    p, put, placed = _hf_putter(hf_state_dict, params, prefix)
    put(["word_embeddings", "embedding"], "embeddings.word_embeddings.weight")
    put(["embed_norm", "scale"], "embeddings.LayerNorm.weight")
    put(["embed_norm", "bias"], "embeddings.LayerNorm.bias")
    put(["rel_embeddings"], "encoder.rel_embeddings.weight")
    for i in range(num_layers):
        hf = f"encoder.layer.{i}."
        fx = f"layer_{i}"
        put([fx, "attention", "in_proj", "kernel"],
            hf + "attention.self.in_proj.weight", transpose=True)
        put([fx, "attention", "q_bias"], hf + "attention.self.q_bias")
        put([fx, "attention", "v_bias"], hf + "attention.self.v_bias")
        put([fx, "attention", "pos_proj", "kernel"],
            hf + "attention.self.pos_proj.weight", transpose=True)
        put([fx, "attention", "pos_q_proj", "kernel"],
            hf + "attention.self.pos_q_proj.weight", transpose=True)
        put([fx, "attention", "pos_q_proj", "bias"],
            hf + "attention.self.pos_q_proj.bias")
        _put_common_layer(put, hf, fx)
    return p, placed[0]


def load_hf_distilbert_weights(params, hf_state_dict, num_layers: int,
                               prefix: str = ""):
    """Map a HuggingFace DistilBertModel state_dict onto BertModel params
    (distill variant: 6 layers, no token types, gelu_cls pooler).

    DistilBERT's encoder is a plain post-LN transformer with renamed
    modules (q_lin/k_lin/v_lin/out_lin, sa_layer_norm, ffn.lin1/lin2,
    output_layer_norm) — reference models/PLM.py:49-57 loads it via
    AutoModel. The reference's added pooler has no pretrained weights
    either, so our gelu_cls pooler keeps its random init."""
    p, put, placed = _hf_putter(hf_state_dict, params, prefix)
    put(["word_embeddings", "embedding"], "embeddings.word_embeddings.weight")
    put(["position_embeddings"], "embeddings.position_embeddings.weight")
    put(["embed_norm", "scale"], "embeddings.LayerNorm.weight")
    put(["embed_norm", "bias"], "embeddings.LayerNorm.bias")
    for i in range(num_layers):
        hf = f"transformer.layer.{i}."
        fx = f"layer_{i}"
        for ours, theirs in [("query", "attention.q_lin"),
                             ("key", "attention.k_lin"),
                             ("value", "attention.v_lin")]:
            put([fx, "attention", ours, "kernel"], hf + theirs + ".weight",
                transpose=True)
            put([fx, "attention", ours, "bias"], hf + theirs + ".bias")
        put([fx, "attn_out", "kernel"], hf + "attention.out_lin.weight",
            transpose=True)
        put([fx, "attn_out", "bias"], hf + "attention.out_lin.bias")
        put([fx, "attn_norm", "scale"], hf + "sa_layer_norm.weight")
        put([fx, "attn_norm", "bias"], hf + "sa_layer_norm.bias")
        put([fx, "ffn_in", "kernel"], hf + "ffn.lin1.weight", transpose=True)
        put([fx, "ffn_in", "bias"], hf + "ffn.lin1.bias")
        put([fx, "ffn_out", "kernel"], hf + "ffn.lin2.weight", transpose=True)
        put([fx, "ffn_out", "bias"], hf + "ffn.lin2.bias")
        put([fx, "ffn_norm", "scale"], hf + "output_layer_norm.weight")
        put([fx, "ffn_norm", "bias"], hf + "output_layer_norm.bias")
    return p, placed[0]


def load_hf_longformer_weights(params, hf_state_dict, num_layers: int,
                               prefix: str = ""):
    """Map a HuggingFace LongformerModel state_dict onto BertModel params
    (longformer variant: local+global banded attention).

    RoBERTa-lineage position ids start at padding_idx+1 = 2, so HF
    position row i+2 is our position i — the table is shifted by two rows
    on import. The layer projections map like BERT; HF's separate
    ``*_global`` q/k/v (used only to recompute the global tokens' rows,
    and initialised from the local projections at conversion time —
    reference models/PLM.py:66-78 loads allenai/longformer-base-4096) have
    no counterpart in our single-projection banded design and are
    intentionally not mapped."""
    import numpy as np

    p, put, placed = _hf_putter(hf_state_dict, params, prefix)
    put(["word_embeddings", "embedding"], "embeddings.word_embeddings.weight")
    key = prefix + "embeddings.position_embeddings.weight"
    if key in hf_state_dict:
        pos = np.asarray(hf_state_dict[key])
        ours = np.asarray(p["params"]["position_embeddings"])
        # hand-rolled shifted copy: keep put()'s strict=False semantics by
        # skipping (not crashing) on a width-mismatched checkpoint
        if pos.ndim == 2 and pos.shape[1] == ours.shape[1]:
            n = min(ours.shape[0], pos.shape[0] - 2)
            ours = ours.copy()
            ours[:n] = pos[2:2 + n]
            p["params"]["position_embeddings"] = jnp.asarray(ours)
            placed[0] += 1
    key = prefix + "embeddings.token_type_embeddings.weight"
    if key in hf_state_dict:
        tt = np.asarray(hf_state_dict[key])
        ours = np.asarray(p["params"]["token_type_embeddings"])
        if tt.ndim == 2 and tt.shape[1] == ours.shape[1]:
            ours = ours.copy()
            n = min(ours.shape[0], tt.shape[0])
            ours[:n] = tt[:n]
            p["params"]["token_type_embeddings"] = jnp.asarray(ours)
            placed[0] += 1
    put(["embed_norm", "scale"], "embeddings.LayerNorm.weight")
    put(["embed_norm", "bias"], "embeddings.LayerNorm.bias")
    for i in range(num_layers):
        hf = f"encoder.layer.{i}."
        fx = f"layer_{i}"
        for ours_n, theirs in [("query", "attention.self.query"),
                               ("key", "attention.self.key"),
                               ("value", "attention.self.value")]:
            put([fx, "attention", ours_n, "kernel"], hf + theirs + ".weight",
                transpose=True)
            put([fx, "attention", ours_n, "bias"], hf + theirs + ".bias")
        _put_common_layer(put, hf, fx)
    put(["pooler", "kernel"], "pooler.dense.weight", transpose=True)
    put(["pooler", "bias"], "pooler.dense.bias")
    return p, placed[0]


def load_hf_funnel_weights(params, hf_state_dict, num_layers: int,
                           prefix: str = "", pool_blocks: int = 3):
    """Structural init of the funnel variant from a HuggingFace
    FunnelBaseModel state_dict (reference models/PLM.py:30-35 loads
    funnel-transformer/small-base via AutoModel).

    Per-block attention/FFN weights are standard shapes and map directly:
    q_head/k_head/v_head → query/key/value (q_head has no bias in HF;
    our query bias keeps its zero init, which IS the no-bias behavior),
    post_proj → attn_out, attention.layer_norm → attn_norm,
    ffn.linear_1/linear_2 → ffn_in/ffn_out, ffn.layer_norm → ffn_norm,
    embeddings.word_embeddings/layer_norm → word_embeddings/embed_norm.
    Our layer i lives in pyramid block b; it takes HF block b's layer at
    the same within-block offset (HF small is B4-4-4; with fewer local
    layers per block the leading HF layers of each block are used).

    NOT mapped, per-weight (no counterpart in this encoder):
    - r_kernel / r_w_bias / r_r_bias: Transformer-XL-style relative
      position attention terms — this encoder uses absolute position
      embeddings (which HF funnel does not have), so the r-terms have
      no slot to land in.
    - r_s_bias / seg_embed: segment (token-type A/B) attention terms;
      single-segment news titles never use them.
    The import is therefore a *structural* initialisation (content
    projections + norms + embeddings), not a numerical-parity load —
    the attention score composition differs by the relative terms.
    """
    p, put, placed = _hf_putter(hf_state_dict, params, prefix)
    put(["word_embeddings", "embedding"], "embeddings.word_embeddings.weight")
    put(["embed_norm", "scale"], "embeddings.layer_norm.weight")
    put(["embed_norm", "bias"], "embeddings.layer_norm.bias")
    # block boundaries identical to BertModel's pool_at computation
    starts = [round(num_layers * b / pool_blocks)
              for b in range(pool_blocks)] + [num_layers]
    for i in range(num_layers):
        b = max(bb for bb in range(pool_blocks) if starts[bb] <= i)
        l = i - starts[b]
        hf = f"encoder.blocks.{b}.{l}."
        fx = f"layer_{i}"
        for ours, theirs in [("query", "attention.q_head"),
                             ("key", "attention.k_head"),
                             ("value", "attention.v_head")]:
            put([fx, "attention", ours, "kernel"], hf + theirs + ".weight",
                transpose=True)
            put([fx, "attention", ours, "bias"], hf + theirs + ".bias")
        put([fx, "attn_out", "kernel"], hf + "attention.post_proj.weight",
            transpose=True)
        put([fx, "attn_out", "bias"], hf + "attention.post_proj.bias")
        put([fx, "attn_norm", "scale"], hf + "attention.layer_norm.weight")
        put([fx, "attn_norm", "bias"], hf + "attention.layer_norm.bias")
        put([fx, "ffn_in", "kernel"], hf + "ffn.linear_1.weight",
            transpose=True)
        put([fx, "ffn_in", "bias"], hf + "ffn.linear_1.bias")
        put([fx, "ffn_out", "kernel"], hf + "ffn.linear_2.weight",
            transpose=True)
        put([fx, "ffn_out", "bias"], hf + "ffn.linear_2.bias")
        put([fx, "ffn_norm", "scale"], hf + "ffn.layer_norm.weight")
        put([fx, "ffn_norm", "bias"], hf + "ffn.layer_norm.bias")
    return p, placed[0]


def load_hf_reformer_weights(params, hf_state_dict, num_layers: int,
                             prefix: str = ""):
    """Structural init of the reformer variant from a HuggingFace
    ReformerModel state_dict (the reference's PLM else-branch loads
    google/reformer-crime-and-punishment via AutoModel — reference
    models/PLM.py:80-84, utils/Manager.py:926).

    Mapped, per-weight (layer kind read from the state dict itself —
    ``query_key`` present ⇒ LSH layer, else local/chunked):
    - LSH layers: self_attention.query_key → query_key (tied q/k, both
      encoders share the projection), self_attention.value → value.
    - Local layers: self_attention.query/key/value → query/key/value
      (our chunked attention, same local-window semantics).
    - attention.output.dense → attn_out. HF reformer projections carry
      NO biases; our zero-initialised biases ARE the no-bias behavior.
    - feed_forward.dense.dense → ffn_in, feed_forward.output.dense →
      ffn_out (both with biases).
    - attention.layer_norm → attn_norm, feed_forward.layer_norm →
      ffn_norm. HF reformer is PRE-LN (norm on the sublayer input);
      this encoder is post-LN — the params land in the nearest
      analogous slot, which makes this a *structural* initialisation
      like funnel's, not a numerical-parity load.
    - embeddings.word_embeddings → word_embeddings (the real checkpoint
      is a 320-entry SentencePiece vocab, so against the wordpiece
      pipeline this maps only when vocabularies agree — the shape guard
      skips it otherwise, documented in PARITY.md #29).
    - embeddings.position_embeddings.weights.0/.1 → axial_pos_0/1 (same
      [s0,1,d0]/[1,s1,d1] HF layout). A checkpoint with a larger axial
      grid (crime-and-punishment factors 524288 positions as
      (512, 1024)) is SLICED to our (40, 32): our position p = i0*32+i1
      takes the checkpoint's (i0, i1) components — axial-consistent for
      the shared corner, an init not a parity mapping.

    NOT mapped, per-weight (no counterpart in this encoder):
    - encoder.layer_norm.{weight,bias} [2H]: the reversible-residual
      output norm over the CONCATENATED two streams — this encoder keeps
      one post-LN H-wide stream, so a 2H norm has no slot.
    (The reversible residual itself holds no weights — every learned
    reformer tensor is enumerated above.)
    """
    import numpy as np

    p, put, placed = _hf_putter(hf_state_dict, params, prefix)
    put(["word_embeddings", "embedding"], "embeddings.word_embeddings.weight")
    # axial halves: slice larger checkpoints down to our grid/dims
    for our_name, hf_key, axis in (
            ("axial_pos_0", "embeddings.position_embeddings.weights.0", 0),
            ("axial_pos_1", "embeddings.position_embeddings.weights.1", 1)):
        key = prefix + hf_key
        if key in hf_state_dict and our_name in p["params"]:
            w = np.asarray(hf_state_dict[key])
            ours = np.asarray(p["params"][our_name])
            if w.ndim == 3 and w.shape[2] == ours.shape[2] \
                    and w.shape[axis] >= ours.shape[axis] \
                    and w.shape[1 - axis] == 1:
                sl = [slice(None)] * 3
                sl[axis] = slice(0, ours.shape[axis])
                p["params"][our_name] = jnp.asarray(w[tuple(sl)])
                placed[0] += 1
    for i in range(num_layers):
        hf = f"encoder.layers.{i}."
        fx = f"layer_{i}"
        att = hf + "attention.self_attention."
        if prefix + att + "query_key.weight" in hf_state_dict:
            put([fx, "attention", "query_key", "kernel"],
                att + "query_key.weight", transpose=True)
        else:
            put([fx, "attention", "query", "kernel"], att + "query.weight",
                transpose=True)
            put([fx, "attention", "key", "kernel"], att + "key.weight",
                transpose=True)
        put([fx, "attention", "value", "kernel"], att + "value.weight",
            transpose=True)
        put([fx, "attn_out", "kernel"], hf + "attention.output.dense.weight",
            transpose=True)
        put([fx, "attn_norm", "scale"], hf + "attention.layer_norm.weight")
        put([fx, "attn_norm", "bias"], hf + "attention.layer_norm.bias")
        put([fx, "ffn_in", "kernel"], hf + "feed_forward.dense.dense.weight",
            transpose=True)
        put([fx, "ffn_in", "bias"], hf + "feed_forward.dense.dense.bias")
        put([fx, "ffn_out", "kernel"],
            hf + "feed_forward.output.dense.weight", transpose=True)
        put([fx, "ffn_out", "bias"], hf + "feed_forward.output.dense.bias")
        put([fx, "ffn_norm", "scale"], hf + "feed_forward.layer_norm.weight")
        put([fx, "ffn_norm", "bias"], hf + "feed_forward.layer_norm.bias")
    return p, placed[0]


def flax_unfreeze(params):
    """Deep-copy params into plain mutable dicts."""
    if isinstance(params, dict):
        return {k: flax_unfreeze(v) for k, v in params.items()}
    try:
        import flax.core
        if isinstance(params, flax.core.FrozenDict):
            return {k: flax_unfreeze(v) for k, v in params.items()}
    except Exception:
        pass
    return params
