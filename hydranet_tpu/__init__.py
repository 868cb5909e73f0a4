"""hydranet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multitask perception framework.

Re-implements the full capability surface of the reference HydraNet stack
(mono-forward-camera multitask perception: shared RegNetY backbone + BiFPN neck
feeding anchor-based detection, semantic segmentation, and anchor-row lane
detection heads) as an idiomatic JAX framework:

- NHWC layout, functional modules (flax.linen), explicit PRNG.
- One compiled XLA program for preprocess + 3-head forward + all post-processing
  (box decode + class-aware NMS, seg argmax, lane decode + lane NMS) — no
  per-frame host round trip (reference keeps these in Python/C++ host loops,
  e.g. /root/reference/model/head_lane/lane_codec.py:116-219).
- Data parallelism via jax.sharding.Mesh + shard_map (reference: single-process
  NCCL DDP, /root/reference/model/train.py:129-137).
"""

__version__ = "0.1.0"

from hydranet_tpu.config import Config, load_config  # noqa: F401
