"""Reparameterized Gaussian sampling and anytime latent masking.

Reference semantics: ``sampling`` at src/module/function.py:35-38 (host-side
``tf.random.normal``) and the missing-dimension mask protocol at
src/module/nolbo.py:199-208. Here RNG is explicit (``jax.random``) so every
sample is device-side, deterministic under a key, and jit/pjit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reparameterize(key: jax.Array, mean: jax.Array, log_var: jax.Array) -> jax.Array:
    """Draw z ~ N(mean, exp(log_var)) via the reparameterization trick.

    z = mean + exp(0.5 * log_var) * eps,  eps ~ N(0, I).
    """
    eps = jax.random.normal(key, mean.shape, dtype=mean.dtype)
    return mean + jnp.exp(0.5 * log_var) * eps


def mask_latent(
    key: jax.Array,
    z: jax.Array,
    missing_prob: float,
    fill_value: jax.Array | float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Anytime observation mask: each latent dim is *missing* w.p. missing_prob.

    Missing dims are replaced by ``fill_value`` (broadcastable; the reference
    uses the mean of the class-prior means, src/module/nolbo.py:200-208).

    Returns ``(z_masked, mask)`` where ``mask`` is 1.0 for observed dims and
    0.0 for missing dims. Unlike the reference (which multiplies by the mask
    and then tests ``z == 0``, spuriously treating exact-zero latents as
    missing), the mask is applied directly with ``jnp.where``.
    """
    keep = jax.random.bernoulli(key, p=1.0 - missing_prob, shape=z.shape)
    mask = keep.astype(z.dtype)
    z_masked = jnp.where(keep, z, jnp.broadcast_to(jnp.asarray(fill_value, z.dtype), z.shape))
    return z_masked, mask


def mix_latent(key: jax.Array, z: jax.Array, z_prior: jax.Array, mix_prob: float = 0.5) -> jax.Array:
    """Element-wise mixture of posterior and prior samples.

    Training-time decoder-input trick from src/module/nolbo.py:119-124: with
    probability ``mix_prob`` per element, take the prior sample instead of the
    posterior sample. The reference gates the whole batch on a host coin flip
    and then mixes element-wise; here the two-level scheme is collapsed into a
    single element-wise Bernoulli draw (same marginal mixing rate at
    mix_prob=0.25 equivalence; configs expose the rate explicitly).
    """
    take_prior = jax.random.bernoulli(key, p=mix_prob, shape=z.shape)
    return jnp.where(take_prior, z_prior, z)
