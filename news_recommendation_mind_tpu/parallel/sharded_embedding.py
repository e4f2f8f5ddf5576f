"""Row-sharded embedding tables over the device mesh.

The multi-host scaling piece SURVEY §2.5 calls out as genuinely new (the
reference replicates its tables on every GPU): the [vocab, dim] table is
sharded across the 'model' mesh axis by rows while the dense towers stay
data-parallel. The lookup is an explicit `shard_map`:

- every model shard holds rows [r0, r0+rows) and masks ids outside its
  range (one clipped local gather, no host indirection);
- a `psum` over the model axis assembles full embeddings — this is the
  all-to-all-free formulation: the collective moves [batch, dim]
  activations over ICI instead of gathering the table;
- reverse-mode AD through the shard_map yields the scatter-add of
  gradients into each shard's local rows (table grads stay sharded).

`partition_rules` maps a TrainState pytree to NamedShardings (embedding
rows → P('model', None); everything else replicated) so jit keeps table,
Adam moments, and updates resident on their shards.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def sharded_lookup(table: jnp.ndarray, ids: jnp.ndarray, mesh: Mesh,
                   model_axis: str = "model",
                   data_axis: str = "data") -> jnp.ndarray:
    """Lookup ids in a row-sharded table; result is data-sharded.

    table [V, D] sharded P(model, None) — V must divide the model axis;
    ids [B, ...] sharded P(data, None...). Works under jit.
    """
    mp = mesh.shape[model_axis]
    rows = table.shape[0] // mp
    ids_spec = P(data_axis, *([None] * (ids.ndim - 1)))
    out_spec = P(data_axis, *([None] * ids.ndim))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(model_axis, None), ids_spec),
        out_specs=out_spec)
    def lookup(tab, local_ids):
        shard = jax.lax.axis_index(model_axis)
        local = local_ids - shard * rows
        valid = (local >= 0) & (local < rows)
        local = jnp.clip(local, 0, rows - 1)
        emb = jnp.take(tab, local, axis=0)
        emb = jnp.where(valid[..., None], emb, 0)
        return jax.lax.psum(emb, model_axis)

    return lookup(table, ids)


def pad_vocab(vocab_size: int, model_parallel: int) -> int:
    """Round the table rows up so every model shard is equal-sized."""
    return -(-vocab_size // model_parallel) * model_parallel


class ShardedWordEmbedding(nn.Module):
    """WordEmbedding with rows sharded over the mesh 'model' axis.

    Falls back to a plain gather when the model axis is absent or 1.
    The mesh is static module state; the table param carries a flax
    Partitioned annotation so partition_rules can find it.
    """
    vocab_size: int
    embedding_dim: int
    mesh: Optional[Mesh] = None
    model_axis: str = "model"
    data_axis: str = "data"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        mp = (self.mesh.shape.get(self.model_axis, 1)
              if self.mesh is not None else 1)
        rows = pad_vocab(self.vocab_size, max(mp, 1))
        table = self.param("embedding", nn.initializers.normal(0.02),
                           (rows, self.embedding_dim), jnp.float32)
        if self.mesh is None or mp <= 1:
            return jnp.take(table, token_ids, axis=0).astype(self.dtype)
        out = sharded_lookup(table, token_ids, self.mesh,
                             self.model_axis, self.data_axis)
        return out.astype(self.dtype)


def partition_rules(mesh: Mesh, vocab_threshold: int = 1024,
                    model_axis: str = "model",
                    zero1_axis: Optional[str] = None,
                    zero1_min_size: int = 2048
                    ) -> Callable[[tuple, jnp.ndarray], NamedSharding]:
    """Leaf → NamedSharding rule for a TrainState pytree.

    Any 2-D leaf on an 'embedding' path with ≥vocab_threshold rows (the
    table and its Adam moments, which mirror the params tree) is sharded
    P(model, None); everything else is replicated. Used for jit
    in/out_shardings so sharded state never materializes replicated.

    With ``zero1_axis`` (ZeRO stage 1, SURVEY §2.5's "cheap win" row —
    the reference replicates plain Adam everywhere): dense-tower Adam
    moments (`mu`/`nu` leaves under opt_state) shard their leading axis
    over that mesh axis when divisible and ≥ ``zero1_min_size`` elements.
    Adam's update is elementwise, so sharded-moment updates are exact;
    XLA inserts the update all-gather implied by replicated params
    (pinned by tests/test_zero1.py equality vs replicated)."""
    has_model = model_axis in mesh.shape and mesh.shape[model_axis] > 1
    z_size = mesh.shape.get(zero1_axis, 1) if zero1_axis else 1

    def rule(path: tuple, leaf) -> NamedSharding:
        segs = [str(getattr(k, "key", getattr(k, "name", k)))
                .strip(".'\"[]").lower() for k in path]
        names = "/".join(segs)
        if (has_model and hasattr(leaf, "ndim") and leaf.ndim == 2
                and leaf.shape[0] >= vocab_threshold
                and "embedding" in names):
            return NamedSharding(mesh, P(model_axis, None))
        if (zero1_axis and z_size > 1 and "opt_state" in segs
                and ("mu" in segs or "nu" in segs)
                and hasattr(leaf, "ndim") and leaf.ndim >= 1
                and leaf.size >= zero1_min_size):
            # shard the first axis divisible by the mesh axis (the
            # flagship table is [30522, 768]: rows don't divide 8, the
            # feature axis does)
            for ax in range(leaf.ndim):
                if leaf.shape[ax] % z_size == 0:
                    spec = [None] * leaf.ndim
                    spec[ax] = zero1_axis
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return rule


def shard_train_state(state, mesh: Mesh, rule=None):
    """device_put every TrainState leaf onto its mesh sharding."""
    rule = rule or partition_rules(mesh)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(leaf, rule(path, leaf)), state)


def state_shardings(state, mesh: Mesh, rule=None):
    """Pytree of NamedShardings matching the TrainState structure."""
    rule = rule or partition_rules(mesh)
    return jax.tree_util.tree_map_with_path(rule, state)
