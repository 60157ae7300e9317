"""insv2v_tpu — a TPU-native instruction-driven video editing framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
amazon-science/instruct-video-to-video (InsV2V, ICLR 2024): an
InstructPix2Pix-style latent-diffusion UNet inflated to 3D with
AnimateDiff-style temporal motion modules, dual classifier-free guidance
(text x video) sampling, sliding-window long-video stitching with
ref-frame noise anchoring and optional optical-flow motion compensation,
plus a data-parallel trainer for the motion modules.

Design (TPU-first, not a port):
  * canonical video layout is ``(B, F, H, W, C)`` — channels-last for
    XLA:TPU convolutions; spatial ops fold frames into batch with a
    single reshape, temporal ops fold pixels into batch with a single
    transpose+reshape.
  * samplers are pure functions: scheduler tables are precomputed
    arrays, the denoise loop is a ``lax.scan`` carrying ``(latent, rng)``
    with the 3-way CFG batch fused into one UNet call.
  * training scales over a ``jax.sharding.Mesh`` via ``jit`` with
    sharding annotations (DP batch axis, ZeRO-style sharded optimizer
    state); collectives are emitted by XLA, never hand-written.
  * the hot attention layouts run through a Pallas flash-attention
    kernel on TPU with a fused-XLA fallback elsewhere.
"""

__version__ = "0.1.0"
