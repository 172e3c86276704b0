"""Differentiable quantization simulators (softround / noise / STE).

Functional JAX equivalents of the reference quantizer
(reference: coolchic/enc/component/core/quantizer.py:16-233). All functions
are pure, shape-polymorphic and vmap/jit-friendly; the straight-through
estimators are expressed with ``stop_gradient`` rather than custom autograd
classes, which makes them trivially compatible with ``vmap`` and ``scan``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

QUANTIZER_NOISE_TYPES = ("kumaraswamy", "gaussian", "none")
QUANTIZER_TYPES = (
    "softround_alone",
    "softround",
    "hardround",
    "ste",
    "none",
    "true_ste",
)


def softround(x: jax.Array, t: jax.Array | float) -> jax.Array:
    """Soft rounding (Agustsson & Theis, "Universally Quantized Neural
    Compression"): floor(x) + tanh(d/t) / (2 tanh(1/2t)) + 1/2 with
    d = x - floor(x) - 1/2. t -> 0 recovers round(x); large t -> identity.
    (reference: quantizer.py:16-41)
    """
    floor_x = jnp.floor(x)
    delta = x - floor_x - 0.5
    return floor_x + 0.5 * jnp.tanh(delta / t) / jnp.tanh(1.0 / (2.0 * t)) + 0.5


def kumaraswamy_noise(
    uniform_noise: jax.Array, kumaraswamy_param: jax.Array | float
) -> jax.Array:
    """Reparameterize U(0,1) noise into a Kumaraswamy(a, b(a)) variable
    shifted to (-1/2, 1/2), with b chosen so the mode is always 1/2
    (C3, Kim et al.). a=1 gives back the uniform distribution.
    (reference: quantizer.py:62-107)
    """
    a = kumaraswamy_param
    b = (2.0**a * (a - 1.0) + 1.0) / a
    return (1.0 - (1.0 - uniform_noise) ** (1.0 / b)) ** (1.0 / a) - 0.5


def quantize(
    x: jax.Array,
    key: Optional[jax.Array],
    quantizer_noise_type: str = "kumaraswamy",
    quantizer_type: str = "softround",
    soft_round_temperature: jax.Array | float = 0.3,
    noise_parameter: jax.Array | float = 1.0,
) -> jax.Array:
    """Simulate quantization of ``x`` (reference: quantizer.py:116-233).

    Modes (``quantizer_type``):
        - ``none``: x + n
        - ``softround_alone``: softround(x, t)
        - ``softround``: softround(softround(x, t) + n, t)
        - ``hardround``: round(x)
        - ``ste``: forward round(x), backward through softround(x, t)
        - ``true_ste``: forward round(x), backward identity

    ``quantizer_noise_type`` selects n: ``gaussian`` (std = noise_parameter)
    or ``kumaraswamy`` (a = noise_parameter) or ``none``.

    ``key`` is a PRNG key; may be None when no noise is required.
    ``quantizer_*`` strings must be static under jit.
    """
    assert quantizer_noise_type in QUANTIZER_NOISE_TYPES, quantizer_noise_type
    assert quantizer_type in QUANTIZER_TYPES, quantizer_type

    noise = None
    if quantizer_noise_type == "gaussian":
        noise = jax.random.normal(key, x.shape, x.dtype) * noise_parameter
    elif quantizer_noise_type == "kumaraswamy":
        u = jax.random.uniform(key, x.shape, x.dtype)
        noise = kumaraswamy_noise(u, noise_parameter)

    if quantizer_type == "none":
        return x if noise is None else x + noise
    if quantizer_type == "softround_alone":
        return softround(x, soft_round_temperature)
    if quantizer_type == "softround":
        return softround(
            softround(x, soft_round_temperature) + noise, soft_round_temperature
        )
    if quantizer_type == "ste":
        # Forward: round(x). Backward: d softround(x, t) / dx.
        y = softround(x, soft_round_temperature)
        return y + jax.lax.stop_gradient(jnp.round(x) - y)
    if quantizer_type == "true_ste":
        # Forward: round(x). Backward: identity.
        return x + jax.lax.stop_gradient(jnp.round(x) - x)
    # hardround
    return jnp.round(x)
