"""preworld_tpu: a TPU-native (JAX/XLA/Pallas) vision-centric 3D occupancy world model
framework with the capabilities of PreWorld (ICLR 2025).

Layer map (bottom-up):
  ops/       -- TPU compute kernels: lift-splat voxel pooling, grid sampling,
                volume rendering (the reference's CUDA ops re-designed for XLA/Pallas).
  geometry/  -- pure math: frusta, coordinate chains, ray generation.
  models/    -- flax.linen modules: backbones, necks, view transformer, heads,
                and the end-to-end PreWorld / PreWorld4DTraj models.
  losses/    -- occupancy + rendering losses.
  data/      -- nuScenes dataset adapters, augmentation pipeline, loaders.
  parallel/  -- device mesh + sharding rules (pjit / shard_map over ICI).
  train/     -- config system, train state (optax + EMA), loops, checkpointing.
  metrics/   -- Occ3D mIoU / temporal mIoU / F-score.
"""

__version__ = "0.1.0"
