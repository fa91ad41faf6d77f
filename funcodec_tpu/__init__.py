"""funcodec_tpu: a TPU-native (JAX/XLA/Pallas) neural speech-codec framework.

Re-implements the capabilities of modelscope/FunCodec (EnCodec/SoundStream-style
GAN codecs, FreqCodec, LauraTTS codec language model) with a TPU-first design:

- channels-last (B, T, C) layouts feeding ``lax.conv_general_dilated`` on the MXU
- residual vector quantization as a single batched distance kernel + ``lax.scan``
- functional EMA codebook state (psum-synchronized under data parallelism)
- one jitted train step over a ``jax.sharding.Mesh`` instead of DDP processes

This is a ground-up rebuild, not a port; file:line citations in docstrings point
at the PyTorch reference only to document behavioral parity.
"""

__version__ = "0.1.0"
