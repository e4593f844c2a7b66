"""PPMStereo-TPU: a TPU-native (JAX/XLA/Pallas) framework for temporally
consistent disparity estimation from stereo video.

Re-designed from scratch for TPU with the capability surface of the
PPMStereo reference (pick-and-play memory video stereo, plus the
DynamicStereo / BiDAStereo / StereoAnyVideo model families, a video-stereo
data layer, sliding-window long-video inference, distributed training and
an EPE / temporal-EPE evaluation harness).

Layout (bottom-up):
  ops/        pure-function numerics (jit-friendly, channels-last)
  kernels/    Pallas TPU kernels for the hot ops
  nn/         flax.linen building blocks (encoders, GRUs, attention)
  models/     full model graphs + sliding-window drivers
  parallel/   mesh construction, sharding rules, multi-host streaming
  data/       dataset readers + sequence augmentation
  train/      losses, optimizer, train step, checkpointing
  evaluation/ metrics (EPE/TEPE) + sequence evaluator
"""

__version__ = "0.1.0"
