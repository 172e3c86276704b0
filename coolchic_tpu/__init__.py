"""coolchic_tpu: a TPU-native JAX/XLA/Pallas rebuild of Cool-chic.

Cool-chic is a low-complexity overfitted neural image codec: a tiny
per-image decoder (hierarchical 2-D latent grids + auto-regressive entropy
MLP + learned separable upsampling + convolutional synthesis) is trained
("encoded") per image with Adam, then its quantized latents and quantized
network weights are entropy coded into a bitstream.

This package is a from-scratch TPU-first re-design (not a port) of the
reference implementation (pepborrell/cool-chic). The compute path is pure
functional JAX: parameters are pytrees, the forward pass and the whole
per-image training loop are jit-compiled, and many images are overfitted in
parallel on a single chip with ``vmap`` (and across chips with
``jax.sharding``).

Reference behavior captured here: coolchic/enc/component/coolchic.py:291-479
(forward RD math), coolchic/enc/training/* (training recipes).
"""

__version__ = "0.1.0"
