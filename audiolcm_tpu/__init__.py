"""audiolcm_tpu — a TPU-native latent-consistency text-to-audio framework.

A from-scratch JAX/XLA/Pallas rebuild of the AudioLCM capability set
(text prompt -> CLAP+T5 encoding -> latent DiT with 1-4 step LCM sampling
-> 1D mel VAE decode -> BigVGAN vocoder -> 16 kHz waveform), designed for
static-shape bucket-compiled TPU execution with data-parallel pjit meshes.

Reference behavior parity target: /root/reference (Text-to-Audio/AudioLCM),
see SURVEY.md. This is not a port: all compute paths are jitted XLA graphs
with channels-last layouts, lax.scan sampling loops and Pallas kernels for
the hot ops.
"""

__version__ = "0.1.0"
