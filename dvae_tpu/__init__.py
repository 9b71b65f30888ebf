"""dvae_tpu: a TPU-native framework for learning disentangled representations
of negation and uncertainty with sequence VAEs.

This is a from-scratch JAX/XLA/Pallas rebuild with the capabilities of the
reference implementation (jvasilakes/disentanglement-vae, ACL 2022). It is NOT
a port: the compute path is a single fused XLA program per train/eval step,
recurrence is expressed as `jax.lax.scan` over time with all input projections
batched into MXU-sized matmuls, and scaling is expressed through
`jax.sharding.Mesh` + NamedSharding (data-parallel over ICI, with a seam for a
`model` axis).

Public surface (mirrors the reference's capabilities):
  - dvae_tpu.config          -- config schema/validation (reference vae/utils.py:48-88)
  - dvae_tpu.data            -- jsonl reading, tokenization, label codecs,
                                vocab, ratio-mixed batching, fixed-shape pipeline
  - dvae_tpu.models          -- encoder/decoder/discriminators/CLUB as pure fns
  - dvae_tpu.losses          -- all five loss families
  - dvae_tpu.training        -- fused train/eval steps, driver, checkpoints
  - dvae_tpu.parallel        -- mesh + sharding helpers
  - dvae_tpu.evaluation      -- MIG/consistency/controlled-generation/... suite
"""

__version__ = "0.1.0"
