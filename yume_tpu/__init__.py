"""yume_tpu — a TPU-native interactive world-generation framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference Yume system (autoregressive long-video generation driven by
keyboard/mouse control text): Wan2.2-TI2V-5B and Wan2.1-I2V-14B diffusion
transformers with FramePack multi-scale history compression, MVDT masked
training, flow-matching transport, ADD adversarial distillation, causal 3D
VAEs, umT5/CLIP encoders, SPMD parallelism over device meshes, and
autoregressive segment rollout with test-time-scaling samplers.

Layout:
    configs/    model + pipeline configuration dataclasses
    ops/        Pallas kernels + core array ops (RoPE, attention, ...)
    models/     DiT, VAE, text/image encoders, discriminator (flax.linen)
    diffusion/  flow-matching transport, schedules, samplers
    parallel/   mesh construction, shardings, sequence parallelism
    pipelines/  conditioning prep + generation loops (ti2v-5B, i2v-14B)
    training/   train step, EMA, optimizers
    data/       dataset, camera-control tooling
    utils/      checkpointing, masks, video io, logging
    serving/    interactive web server
"""

__version__ = "0.1.0"
