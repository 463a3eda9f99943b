"""MatchNeRF-TPU: a TPU-native (JAX / XLA / Pallas / pjit) generalizable-NeRF framework.

Re-implements the full capability surface of the MatchNeRF reference
(donydchen/matchnerf — "Explicit Correspondence Matching for Generalizable
Neural Radiance Fields", TPAMI 2025) as a brand-new TPU-first design:

- functional core: pure functions over parameter pytrees, jit-compiled
  end-to-end render / train steps with static shapes
- GMFlow-style multi-view feature matching encoder with swin window attention
- conditional NeRF decoder (grouped cosine-similarity matching prior,
  multiplicative feature bias, ray transformer, emission-absorption compositing)
- mesh/`NamedSharding` data & ray parallelism instead of torch DataParallel
- host-side numpy dataset pipeline producing fixed-shape device batches
"""

__version__ = "0.1.0"
