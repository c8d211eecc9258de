"""back2future_tpu — TPU-native multi-frame optical flow framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the Torch7
"Back2Future" framework (Janai et al., ECCV 2018; reference at
/root/reference): a multi-frame PWC-style coarse-to-fine flow network with a
soft occlusion head, unsupervised occlusion-aware photometric training,
multi-device data parallelism, a host data pipeline, flow file I/O and
visualization, and a 3-frame inference API.

Layering (mirrors SURVEY.md §7):
  io       — pure NumPy flow I/O + visualization (no JAX deps)
  ops      — differentiable image ops (warp, cost volume, pyramid resampling)
             with pure-JAX reference implementations and Pallas TPU kernels
  models   — flax modules (PWCMulti, SPyNet) + param surgery
  losses   — penalty functions and all training criterions, with
             reference-parity custom VJPs where the original hand-written
             backward passes deviate from true gradients
  data     — dataset manifests, sample loading, augmentation, prefetch
  parallel — mesh/sharding helpers (DP over ICI via shard_map)
  train    — optimizer regimes, multi-scale loss assembly, train/eval steps,
             metrics, checkpointing
  api      — init()/compute_flow() inference entry points
"""

__version__ = "0.1.0"
