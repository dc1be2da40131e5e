"""AnytimeReconstructor: the anytime engine as a first-class streaming API.

The paper's deployment story (SURVEY.md header): observations of an object
accumulate over time; at ANY point the system can decode the current best
shape, and quality improves monotonically. The reference only simulates this
with per-batch masks (nolbo.py:199-208). Here it is an explicit object:

    rec = AnytimeReconstructor(model, params, prior_means)
    state = rec.new_object()                      # prior-only belief
    state = rec.observe(state, mean, log_var, mask)   # per-frame posterior
    shape = rec.decode(state, key)                # anytime decode
    label = rec.classify(state)                   # nearest prior
    state = rec.correct(state)                    # snap unobserved dims

Beliefs are pytrees -> the whole loop jit/vmaps over objects; fusion is the
information-filter update (anytime/engine.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from anytime3d_tpu.anytime.engine import (
    GaussianBelief,
    OccupancyBelief,
    classify_by_prior,
    fuse_observation,
    fuse_occupancy,
)
from anytime3d_tpu.models.mmvae import MultiModalVAE


class AnytimeReconstructor:
    def __init__(
        self,
        model: MultiModalVAE,
        params,
        prior_means: Optional[jnp.ndarray] = None,
        prior_log_vars: Optional[jnp.ndarray] = None,
    ):
        self.model = model
        self.params = params
        if prior_means is None and model.config.prior_category is not None:
            eye = jnp.eye(model.config.prior_category.input_dim)
            prior_means, prior_log_vars = model.apply(
                {"params": params}, eye, method=MultiModalVAE.priors_category
            )
        self.prior_means = prior_means
        self.prior_log_vars = prior_log_vars

    # ---- belief lifecycle -------------------------------------------------
    def new_object(self, batch_shape=()) -> GaussianBelief:
        """Uninformative belief (or pass your own prior via from_moments)."""
        z_dim = self.prior_means.shape[-1]
        return GaussianBelief.uninformative((*batch_shape, z_dim))

    def encode_observation(self, image_or_voxel):
        """One frame -> (mean, log_var) posterior blocks for fusion."""
        enc = self.model.apply(
            {"params": self.params}, image_or_voxel, method=MultiModalVAE.encode
        )
        mean = enc.mean_category if enc.mean_category is not None else enc.mean_inst
        lv = (
            enc.log_var_category
            if enc.log_var_category is not None
            else enc.log_var_inst
        )
        if lv is None:
            lv = jnp.zeros_like(mean)
        return mean, lv

    def observe(
        self, belief: GaussianBelief, mean, log_var, mask=None
    ) -> GaussianBelief:
        return fuse_observation(belief, mean, log_var, mask)

    # ---- anytime outputs --------------------------------------------------
    def decode(self, belief: GaussianBelief, key: Optional[jax.Array] = None):
        z = belief.mean
        if key is not None:
            z = z + jnp.exp(0.5 * belief.log_var) * jax.random.normal(key, z.shape)
        if z.ndim == 1:
            z = z[None]
        return self.model.apply({"params": self.params}, z, method=MultiModalVAE.decode)

    def classify(self, belief: GaussianBelief, observed_precision: float = 1e-3):
        z = belief.mean
        if z.ndim == 1:
            z = z[None]
        mask = (belief.precision > observed_precision).astype(z.dtype)
        if mask.ndim == 1:
            mask = mask[None]
        return classify_by_prior(z, self.prior_means, mask=mask)

    def correct(
        self, belief: GaussianBelief, observed_precision: float = 1e-3
    ) -> GaussianBelief:
        """Fuse the nearest class prior into dims with ~no observations —
        the streaming generalization of the reference's correction pass
        (nolbo.py:239-243)."""
        squeeze = belief.mean.ndim == 1
        z = belief.mean[None] if squeeze else belief.mean
        prec = belief.precision[None] if squeeze else belief.precision
        mask = (prec > observed_precision).astype(z.dtype)
        nearest = classify_by_prior(z, self.prior_means, mask=mask)
        mu = self.prior_means[nearest]
        lv = (
            self.prior_log_vars[nearest]
            if self.prior_log_vars is not None
            else jnp.zeros_like(mu)
        )
        # prior acts only on unobserved dims
        fused = fuse_observation(
            GaussianBelief(info=z * prec, precision=prec), mu, lv, mask=1.0 - mask
        )
        if squeeze:
            return GaussianBelief(info=fused.info[0], precision=fused.precision[0])
        return fused

    # ---- occupancy-space (decoded) fusion ---------------------------------
    def new_shape_belief(self, grid_shape) -> OccupancyBelief:
        """Empty log-odds accumulator over the decoder's output grid."""
        return OccupancyBelief.empty(grid_shape)

    def observe_decoded(
        self, belief: OccupancyBelief, z_or_belief, mask=None
    ) -> OccupancyBelief:
        """Decode one observation's latent and fuse its occupancy grid into
        the running product-of-experts belief (``belief.probs`` is the
        anytime fused shape). Accepts a raw latent z or a GaussianBelief
        (its mean is decoded). ``mask``: per-voxel visibility of THIS
        observation (engine.fuse_occupancy) — required for partially-
        occluded views, whose decodes systematically vote 'absent' on
        voxels they cannot see."""
        z = z_or_belief.mean if isinstance(z_or_belief, GaussianBelief) else z_or_belief
        return fuse_occupancy(belief, self.decode_z(z), mask)

    def decode_z(self, z):
        if z.ndim == 1:
            z = z[None]
        return self.model.apply(
            {"params": self.params}, z, method=MultiModalVAE.decode
        )

    def observe_stream(
        self,
        belief: GaussianBelief,
        means,
        log_vars,
        masks=None,
        mesh=None,
        axis: str = "data",
    ) -> GaussianBelief:
        """Fuse a stacked (T, ...) stream of observations in one shot.

        Sequential ``lax.scan`` by default; pass a ``jax.sharding.Mesh`` to
        shard the stream over ``axis`` (fuse_sequence_sharded: per-device
        partial information sums + one psum — bit-compatible with the scan
        up to fp reduction order). The batched form of the reference's
        per-observation update loop (nolbo.py:199-208)."""
        from anytime3d_tpu.anytime.engine import fuse_sequence, fuse_sequence_sharded

        if mesh is not None:
            return fuse_sequence_sharded(
                mesh, means, log_vars, masks, prior=belief, axis=axis
            )
        return fuse_sequence(means, log_vars, masks, prior=belief)
