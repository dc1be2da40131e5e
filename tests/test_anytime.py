"""Anytime-protocol tests: masking, correction, Gaussian fusion (SURVEY.md §4e)."""

import jax
import jax.numpy as jnp
import numpy as np

from anytime3d_tpu.anytime import (
    GaussianBelief,
    anytime_eval,
    classify_by_prior,
    correct_latent,
    fuse_observation,
    fuse_sequence,
)
from anytime3d_tpu.models.mmvae import MultiModalVAE
from anytime3d_tpu.train import LossConfig, create_train_state, make_train_step

from tests.test_train import synth_batch, tiny_voxel_cfg


class TestClassifyCorrect:
    def test_classify_exact(self):
        priors = jnp.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]])
        z = jnp.array([[9.0, 9.5], [0.1, -0.2]])
        pred = np.asarray(classify_by_prior(z, priors))
        assert list(pred) == [1, 0]

    def test_masked_distance_ignores_missing(self):
        priors = jnp.array([[0.0, 100.0], [10.0, 0.0]])
        # dim 1 is missing; observed dim 0 says class 1
        z = jnp.array([[9.0, -999.0]])
        mask = jnp.array([[1.0, 0.0]])
        pred = np.asarray(classify_by_prior(z, priors, mask=mask))
        assert pred[0] == 1

    def test_correct_latent_mean_mode(self):
        priors = jnp.array([[0.0, 0.0, 5.0], [10.0, 10.0, -5.0]])
        z = jnp.array([[10.1, -1.0, 0.0]])
        mask = jnp.array([[1.0, 0.0, 0.0]])
        z_c = np.asarray(
            correct_latent(jax.random.PRNGKey(0), z, mask, priors, mode="mean")
        )
        # observed dim kept; missing dims snapped to class-1 prior
        assert z_c[0, 0] == np.float32(10.1)
        assert z_c[0, 1] == 10.0 and z_c[0, 2] == -5.0

    def test_correct_latent_gated_skips_unconfident(self):
        """_gated modes correct only samples whose two nearest priors are
        well separated over the OBSERVED dims (r4: unconditional correction
        poisons reconstruction when classification is unreliable)."""
        priors = jnp.array([[0.0, 0.0, 5.0], [10.0, 10.0, -5.0]])
        # sample 0: observed dim clearly class 1 (margin large) -> corrected
        # sample 1: observed dim equidistant (margin ~0) -> untouched
        z = jnp.array([[10.1, -1.0, 0.0], [5.0, -1.0, 0.0]])
        mask = jnp.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        z_c = np.asarray(
            correct_latent(
                jax.random.PRNGKey(0), z, mask, priors, mode="mean_gated"
            )
        )
        assert z_c[0, 1] == 10.0 and z_c[0, 2] == -5.0  # confident: corrected
        np.testing.assert_array_equal(z_c[1], np.asarray(z[1]))  # kept

    def test_correct_latent_resample_near_prior(self):
        priors = jnp.array([[0.0] * 8, [10.0] * 8])
        z = jnp.full((1, 8), 9.5)
        mask = jnp.concatenate([jnp.ones((1, 4)), jnp.zeros((1, 4))], axis=-1)
        z_c = np.asarray(
            correct_latent(jax.random.PRNGKey(0), z, mask, priors, mode="resample")
        )
        assert np.allclose(z_c[0, :4], 9.5)
        # resampled from N(10, 1): within a few sigmas
        assert (np.abs(z_c[0, 4:] - 10.0) < 5.0).all()


class TestAnytimeEval:
    def _trained(self, steps=30):
        model = MultiModalVAE(tiny_voxel_cfg(variational=True, with_prior=True))
        batch = synth_batch(n=8)
        state = create_train_state(model, batch["input"], jax.random.PRNGKey(0), learning_rate=3e-3)
        step = make_train_step(model, LossConfig(), donate=False)
        for i in range(steps):
            state, _ = step(state, batch, jax.random.PRNGKey(i))
        return model, state, batch

    def test_protocol_outputs(self):
        model, state, batch = self._trained(steps=5)
        m0 = anytime_eval(model, state.params, batch, jax.random.PRNGKey(0), missing_prob=0.0)
        assert set(m0) >= {"acc_category", "loss_shape", "precision", "recall"}
        assert "precision_corrected" not in m0
        m5 = anytime_eval(model, state.params, batch, jax.random.PRNGKey(0), missing_prob=0.5)
        assert "precision_corrected" in m5 and "acc_category_corrected" in m5

    def test_jit_compatible(self):
        model, state, batch = self._trained(steps=1)
        fn = jax.jit(
            lambda p, b, k: anytime_eval(model, p, b, k, missing_prob=0.3)
        )
        m = fn(state.params, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss_shape"]))

    def test_external_prior_means(self):
        # AE/VAE path: category_vectors instead of priornet (nolbo.py:632-698)
        model = MultiModalVAE(tiny_voxel_cfg(variational=True, with_prior=False))
        batch = synth_batch(n=8)
        state = create_train_state(model, batch["input"], jax.random.PRNGKey(0))
        vectors = jnp.asarray(np.random.default_rng(0).normal(size=(5, 8)).astype(np.float32))
        m = anytime_eval(
            model, state.params, batch, jax.random.PRNGKey(0),
            missing_prob=0.5, prior_means=vectors,
        )
        assert "precision_corrected" in m


class TestGaussianFusion:
    def test_two_observations_average(self):
        b = GaussianBelief.uninformative((4,))
        m1, lv = jnp.full((4,), 2.0), jnp.zeros((4,))
        m2 = jnp.full((4,), 4.0)
        b = fuse_observation(b, m1, lv)
        b = fuse_observation(b, m2, lv)
        assert np.allclose(np.asarray(b.mean), 3.0, atol=1e-4)
        # two unit-variance obs -> var 1/2
        assert np.allclose(np.asarray(b.log_var), np.log(0.5), atol=1e-3)

    def test_masked_dims_keep_prior(self):
        prior = GaussianBelief.from_moments(jnp.zeros((2,)), jnp.zeros((2,)))
        obs_mean = jnp.array([5.0, 5.0])
        mask = jnp.array([1.0, 0.0])
        b = fuse_observation(prior, obs_mean, jnp.zeros((2,)), mask=mask)
        assert np.allclose(float(b.mean[1]), 0.0)
        assert float(b.mean[0]) > 2.0

    def test_monotone_uncertainty_reduction(self):
        # the anytime property: more observations never increase variance
        rng = np.random.default_rng(0)
        means = jnp.asarray(rng.normal(2.0, 0.1, size=(10, 6)).astype(np.float32))
        lvs = jnp.zeros((10, 6))
        masks = jnp.asarray((rng.uniform(size=(10, 6)) > 0.5).astype(np.float32))
        prev_var = np.inf
        belief = GaussianBelief.uninformative((6,))
        for t in range(10):
            belief = fuse_observation(belief, means[t], lvs[t], masks[t])
            var = float(jnp.sum(1.0 / belief.precision))
            assert var <= prev_var + 1e-6
            prev_var = var

    def test_fuse_sequence_matches_loop(self):
        rng = np.random.default_rng(1)
        means = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
        lvs = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32) * 0.1)
        seq = fuse_sequence(means, lvs)
        loop = GaussianBelief.uninformative((3,))
        for t in range(5):
            loop = fuse_observation(loop, means[t], lvs[t])
        assert np.allclose(np.asarray(seq.mean), np.asarray(loop.mean), rtol=1e-5)

    def test_fuse_sequence_sharded_matches_sequential(self):
        # VERDICT r1 item 7: the shard_map path over the 'data' mesh axis must
        # equal the sequential scan (precision adds are associative)
        from anytime3d_tpu.anytime import fuse_sequence_sharded
        from anytime3d_tpu.parallel import make_mesh

        mesh = make_mesh(data=8, model=1)
        rng = np.random.default_rng(2)
        T, B, D = 24, 4, 6
        means = jnp.asarray(rng.normal(size=(T, B, D)).astype(np.float32))
        lvs = jnp.asarray(rng.normal(size=(T, B, D)).astype(np.float32) * 0.3)
        masks = jnp.asarray((rng.uniform(size=(T, B, D)) > 0.4).astype(np.float32))
        prior = GaussianBelief.from_moments(
            jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)),
            jnp.zeros((B, D), jnp.float32),
        )
        seq = fuse_sequence(means, lvs, masks, prior=prior)
        shd = fuse_sequence_sharded(mesh, means, lvs, masks, prior=prior)
        np.testing.assert_allclose(
            np.asarray(shd.precision), np.asarray(seq.precision), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(shd.mean), np.asarray(seq.mean), rtol=1e-4, atol=1e-5
        )

    def test_fuse_sequence_sharded_rejects_ragged_stream(self):
        from anytime3d_tpu.anytime import fuse_sequence_sharded
        from anytime3d_tpu.parallel import make_mesh

        mesh = make_mesh(data=8, model=1)
        with np.testing.assert_raises(ValueError):
            fuse_sequence_sharded(
                mesh, jnp.zeros((10, 3)), jnp.zeros((10, 3))
            )


class TestOccupancyBelief:
    """Occupancy-space (decoded) log-odds fusion — the product-of-experts
    multi-view combiner (r5; engine.py::OccupancyBelief)."""

    def test_mean_log_odds_and_majority_semantics(self):
        from anytime3d_tpu.anytime import OccupancyBelief, fuse_occupancy

        probs = np.array(
            [[0.9, 0.2, 0.6], [0.8, 0.4, 0.4], [0.9, 0.1, 0.45]], np.float32
        )
        b = OccupancyBelief.empty((3,))
        for p in probs:
            b = fuse_occupancy(b, jnp.asarray(p))
        got = np.asarray(b.probs)
        lo = np.log(probs) - np.log1p(-probs)
        want = 1.0 / (1.0 + np.exp(-lo.mean(0)))
        np.testing.assert_allclose(got, want, rtol=1e-5)
        # thresholding the fused belief at 0.5 == per-voxel majority in
        # log-odds: voxel 0 strongly on, voxel 1 off, voxel 2 mixed-weak off
        assert (got > 0.5).tolist() == [True, False, False]

    def test_associative_and_order_free(self):
        from anytime3d_tpu.anytime import OccupancyBelief, fuse_occupancy

        rng = np.random.default_rng(0)
        probs = rng.uniform(0.05, 0.95, size=(5, 4, 4)).astype(np.float32)
        b1 = OccupancyBelief.empty((4, 4))
        for p in probs:
            b1 = fuse_occupancy(b1, jnp.asarray(p))
        b2 = OccupancyBelief.empty((4, 4))
        for p in probs[::-1]:
            b2 = fuse_occupancy(b2, jnp.asarray(p))
        np.testing.assert_allclose(
            np.asarray(b1.probs), np.asarray(b2.probs), rtol=1e-5
        )

    def test_reconstructor_observe_decoded(self):
        from anytime3d_tpu.anytime import AnytimeReconstructor
        from anytime3d_tpu.models.mmvae import MultiModalVAE
        from anytime3d_tpu.train import create_train_state
        from tests.test_train import synth_batch, tiny_voxel_cfg

        model = MultiModalVAE(tiny_voxel_cfg(variational=True, with_prior=True))
        batch = synth_batch(n=2)
        state = create_train_state(model, batch["input"], jax.random.PRNGKey(0))
        params = state.params
        rec = AnytimeReconstructor(model, params)
        z_dim = rec.prior_means.shape[-1] + (model.config.z_inst_dim or 0)
        grid = model.config.decoder.output_shape
        belief = rec.new_shape_belief((1, *grid))
        for i in range(3):
            z = jax.random.normal(jax.random.PRNGKey(i), (1, z_dim))
            belief = rec.observe_decoded(belief, z)
        probs = np.asarray(belief.probs)
        assert probs.shape == (1, *grid)
        assert np.isfinite(probs).all() and probs.min() >= 0 and probs.max() <= 1
        assert float(belief.count) == 3.0

    def test_visibility_masked_fusion(self):
        """Masked votes: only observed voxels accumulate; unobserved stay
        at the 0.5 prior (engine.fuse_occupancy mask semantics)."""
        from anytime3d_tpu.anytime import OccupancyBelief, fuse_occupancy

        b = OccupancyBelief.empty((4,))
        # view 1 sees voxels 0,1 and votes present/absent
        b = fuse_occupancy(b, jnp.asarray([0.9, 0.1, 0.7, 0.2]),
                           mask=jnp.asarray([1.0, 1.0, 0.0, 0.0]))
        # view 2 sees voxels 1,2: voxel 1 gets a second (present) vote
        b = fuse_occupancy(b, jnp.asarray([0.4, 0.9, 0.8, 0.1]),
                           mask=jnp.asarray([0.0, 1.0, 1.0, 0.0]))
        p = np.asarray(b.probs)
        np.testing.assert_allclose(p[0], 0.9, rtol=1e-5)  # single vote kept
        lo = (np.log(0.1/0.9) + np.log(0.9/0.1)) / 2.0
        np.testing.assert_allclose(p[1], 1/(1+np.exp(-lo)), rtol=1e-5)
        np.testing.assert_allclose(p[2], 0.8, rtol=1e-5)
        np.testing.assert_allclose(p[3], 0.5, rtol=1e-5)  # never observed
        np.testing.assert_allclose(np.asarray(b.count), [1, 2, 1, 0])
