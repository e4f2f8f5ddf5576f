"""news_recommendation_mind_tpu — a TPU-native news-recommendation framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the
reference PyTorch repo tyh666/News-Recommendation-MIND (two-tower / PLM /
one-tower news recommenders on the MIND benchmark), built TPU-first:

- flax models compiled under ``jax.jit`` with static shapes,
- ``lax.scan`` / Pallas recurrent + attention kernels instead of cuDNN,
- data parallelism via ``jax.sharding.Mesh`` + NamedSharding (XLA
  collectives over ICI) instead of NCCL/DDP,
- a host-side numpy streaming loader with device prefetch instead of
  torch DataLoader workers.

Package layout:
- ``config``      — frozen dataclass configuration + CLI parser
- ``data``        — tokenize/cache pipeline, synthetic MIND generator, loaders
- ``models``      — embeddings, news/user encoders, TwoTower/PLM/XFormer
- ``ops``         — compute kernels (scan RNNs, Pallas attention/LSTM)
- ``parallel``    — mesh construction, shardings, multi-host helpers
- ``train``       — train state, optimizer, jitted steps, loop, checkpoints
- ``evaluation``  — impression-grouped metrics + two-phase fast eval engine
- ``cli``         — twotower / plm / xformer entry points
- ``utils``       — logging, BM25/inverted index, misc
"""

__version__ = "0.1.0"
