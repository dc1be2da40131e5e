"""Per-variant loss fidelity: the registry's LossConfig table vs the reference
fit() methods, plus a NumPy transliteration of each reference total_loss
checked against compute_losses on fixed inputs.

References (every expected value below is read off these lines):
- nolboSingleObject.fit            nolbo.py:90-159   (margins 3z/3z, l2, coin+p=0.5 mix)
- nolboSingleObject_instOnly.fit   nolbo.py:365-430  (margin 10z, whole-vector swap :383-386)
- nolboSingleObject_AE/_VAE.fit    nolbo.py:578-630, 795-854 (shape[+KL] + keras losses)
- _category_only.fit               nolbo.py:1026-1075 (0.01*reg margin 3z, p=0.3 mix, NO l2)
- modelnet_category_only.fit       nolbo.py:1619-1676 (0.01*reg margin 2z :1661, NO l2)
- modelnet_category_AE/_VAE.fit    nolbo.py:1231-1258, 1422-1445 (NO l2)
- AE3D.fit                         AE3D.py:46-48, 69-70 (input 2x-1, b_range=False)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anytime3d_tpu.models import configs
from anytime3d_tpu.models.mmvae import MMVAEConfig, MultiModalVAE
from anytime3d_tpu.nn.autoencoder3d import Decoder3DConfig, Encoder3DConfig
from anytime3d_tpu.nn.heads import Head2DConfig
from anytime3d_tpu.nn.priornet import PriorNetConfig
from anytime3d_tpu.train import create_train_state
from anytime3d_tpu.train.step import LossConfig, _encode_and_sample, compute_losses


# --------------------------------------------------------------------------
# the table itself: one assertion block per reference fit()
# --------------------------------------------------------------------------

class TestLossTable:
    def test_every_registry_name_has_a_loss_config(self):
        for name in configs.REGISTRY:
            assert isinstance(configs.loss_config(name), LossConfig), name
            model_cfg, loss_cfg = configs.variant(name)
            assert isinstance(model_cfg, MMVAEConfig)

    def test_gamma_and_b_range_are_universal(self):
        # every reference fit() passes gamma=0.60, b_range=False
        for name in configs.REGISTRY:
            lc = configs.loss_config(name)
            assert lc.gamma == 0.6, name
            assert lc.b_range is False, name

    def test_pascal_nolbo(self):  # nolbo.py:119-147
        lc = configs.loss_config("pascal_nolbo")
        assert lc.reg_weight == 1.0
        assert lc.reg_margin_scale_category == 3.0
        assert lc.reg_margin_scale_inst == 3.0
        assert lc.l2_weight == 5e-4
        assert (lc.mix_coin_prob, lc.mix_element_prob) == (0.5, 0.5)

    def test_kitti_inst_only(self):  # nolbo.py:383-404
        lc = configs.loss_config("kitti_inst_only")
        assert lc.reg_margin_scale_inst == 10.0
        assert lc.reg_weight == 1.0
        assert lc.l2_weight == 5e-4
        # the reference decodes the WHOLE prior vector on the coin flip
        assert (lc.mix_coin_prob, lc.mix_element_prob) == (0.5, 1.0)

    def test_pascal_category(self):  # nolbo.py:1042-1063
        lc = configs.loss_config("pascal_category")
        assert lc.reg_weight == 0.01
        assert lc.reg_margin_scale_category == 3.0
        assert lc.l2_weight == 0.0  # total = kl + shape + 0.01*reg only
        assert (lc.mix_coin_prob, lc.mix_element_prob) == (0.5, 0.3)

    def test_modelnet_nolbo(self):  # nolbo.py:1639-1666
        for name in ("modelnet_nolbo", "modelnet_nolbo_dr"):
            lc = configs.loss_config(name)
            assert lc.reg_weight == 0.01, name
            assert lc.reg_margin_scale_category == 2.0, name  # :1661
            assert lc.l2_weight == 0.0, name
            assert (lc.mix_coin_prob, lc.mix_element_prob) == (0.5, 0.3), name

    def test_plain_vae_ae_variants(self):
        # pascal AE/VAE sum keras .losses (nolbo.py:592-599, 810-812)
        for name in ("pascal_vae", "pascal_vae_dr", "pascal_ae", "pascal_ae_dr"):
            lc = configs.loss_config(name)
            assert lc.l2_weight == 5e-4, name
            assert lc.mix_coin_prob == 0.0, name
        # modelnet AE/VAE never add them (nolbo.py:1247, 1436)
        for name in ("modelnet_vae", "modelnet_vae_dr", "modelnet_ae", "modelnet_ae_dr"):
            lc = configs.loss_config(name)
            assert lc.l2_weight == 0.0, name
            assert lc.mix_coin_prob == 0.0, name

    def test_ae3d(self):  # AE3D.py:46-48, 69-70
        lc = configs.loss_config("ae3d")
        assert lc.input_remap is True
        assert lc.b_range is False
        assert lc.l2_weight == 0.0
        for other in configs.REGISTRY:
            if other != "ae3d":
                assert configs.loss_config(other).input_remap is False, other


# --------------------------------------------------------------------------
# NumPy transliterations of the reference loss functions (function.py)
# --------------------------------------------------------------------------

def ref_binary_loss(pred, target, gamma=0.6, b_range=False, eps=1e-7):
    """function.py:73-82, verbatim in NumPy."""
    b = float(b_range)
    n = pred.shape[0]
    x_t = target.reshape(n, -1)
    x_p = np.clip(pred.reshape(n, -1), eps, 1.0 - eps)
    y_t = -b + (2.0 * b + 1.0) * x_t
    return -np.sum(
        gamma * y_t * np.log(x_p) + (1.0 - gamma) * (1.0 - y_t) * np.log(1.0 - x_p),
        axis=-1,
    )


def ref_kl_loss(m, lv, m_t, lv_t):
    """function.py:84-98, verbatim in NumPy."""
    return np.sum(
        0.5 * (lv_t - lv) + (np.exp(lv) + np.square(m - m_t)) / (2.0 * np.exp(lv_t)) - 0.5,
        axis=-1,
    )


def ref_regulizer_loss(z_mean, z_log_var, dist_in_z_space, class_input=None):
    """function.py:40-71, verbatim in NumPy."""
    diff = np.abs(z_mean[:, None, :] - z_mean[None, :, :]) / np.exp(
        0.5 * z_log_var[:, None, :]
    )
    d = np.sum(diff, axis=-1)
    hinge = d - dist_in_z_space
    pen = np.where(hinge > 0.0, 0.0, np.square(hinge))
    if class_input is not None:
        same = np.sum(np.abs(class_input[:, None, :] - class_input[None, :, :]), axis=-1)
        pen = pen * np.where(same > 0.0, 0.0, 1.0)
    return np.sum(pen, axis=-1)


def ref_l2(params, weight):
    """keras l2(5e-4) over conv/dense kernels."""
    total = 0.0
    def walk(tree):
        nonlocal total
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v)
            elif k == "kernel":
                total += float(np.sum(np.square(np.asarray(v, np.float64))))
    walk(jax.tree_util.tree_map(lambda x: x, params))
    return weight * total


# --------------------------------------------------------------------------
# tiny archetypes, one per reference fit() shape
# --------------------------------------------------------------------------

def _vox_cfg(variational, with_prior, z=6, cat=4):
    enc_out = 2 * z if variational else z
    return MMVAEConfig(
        z_category_dim=z, z_inst_dim=0, category_dim=cat if with_prior else 0,
        encoder="voxel",
        encoder3d=Encoder3DConfig(output_dim=enc_out, filter_nums=(8, 16),
                                  filter_sizes=(3, 3, 3), strides=(2, 2, 1)),
        decoder=Decoder3DConfig(input_dim=z, output_shape=(16, 16, 16, 1),
                                filter_nums=(16, 8, 1), filter_sizes=(3, 3, 3),
                                strides=(1, 2, 2)),
        prior_category=PriorNetConfig(input_dim=cat, unit_nums=(8, z), const_log_var=0.0)
        if with_prior else None,
        variational=variational,
    )


def _dual_image_cfg(zc=4, zi=4, cat=3, inst=2):
    return MMVAEConfig(
        z_category_dim=zc, z_inst_dim=zi, category_dim=cat, inst_dim=inst,
        encoder="image", backbone="darknet53tiny",
        head=Head2DConfig(output_dim=2 * (zc + zi), filter_nums=(), filter_sizes=(),
                          last_pooling="max"),
        decoder=Decoder3DConfig(input_dim=zc + zi, output_shape=(16, 16, 16, 1),
                                filter_nums=(16, 8, 1), filter_sizes=(3, 3, 3),
                                strides=(1, 2, 2)),
        prior_category=PriorNetConfig(input_dim=cat, unit_nums=(8, zc), const_log_var=0.0),
        prior_inst=PriorNetConfig(input_dim=cat + inst, unit_nums=(8, zi), const_log_var=0.0),
        variational=True,
    )


def _kitti_cfg(z=6, inst=3):
    return MMVAEConfig(
        z_category_dim=0, z_inst_dim=z, inst_dim=inst,
        encoder="image", backbone="darknet53tiny",
        head=Head2DConfig(output_dim=2 * z, filter_nums=(), filter_sizes=(),
                          last_pooling="max"),
        decoder=Decoder3DConfig(input_dim=z, output_shape=(16, 16, 16, 1),
                                filter_nums=(16, 8, 1), filter_sizes=(3, 3, 3),
                                strides=(1, 2, 2)),
        prior_inst=PriorNetConfig(input_dim=inst, unit_nums=(8, z), const_log_var=0.0),
        variational=True,
    )


def _vox_batch(n=6, cat=4, seed=0):
    rng = np.random.default_rng(seed)
    vox = (rng.uniform(size=(n, 16, 16, 16, 1)) > 0.7).astype(np.float32)
    return {
        "input": jnp.asarray(vox),
        "target": jnp.asarray(vox),
        "category_onehot": jnp.asarray(np.eye(cat, dtype=np.float32)[rng.integers(0, cat, n)]),
    }


def _img_batch(n=4, cat=3, inst=2, seed=0):
    rng = np.random.default_rng(seed)
    out = {
        "input": jnp.asarray(rng.uniform(size=(n, 64, 64, 3)).astype(np.float32)),
        "target": jnp.asarray(
            (rng.uniform(size=(n, 16, 16, 16, 1)) > 0.7).astype(np.float32)
        ),
    }
    if cat:
        out["category_onehot"] = jnp.asarray(np.eye(cat, dtype=np.float32)[rng.integers(0, cat, n)])
    if inst:
        out["inst_onehot"] = jnp.asarray(np.eye(inst, dtype=np.float32)[rng.integers(0, inst, n)])
    return out


def _expected_total(model, lc, params, batch, fwd):
    """NumPy transliteration of the variant's reference total_loss, assembled
    from the SAME forward tensors the step used."""
    mcfg = model.config
    pred = np.asarray(fwd["pred"], np.float32)
    target = np.asarray(batch["target"], np.float32)
    total = float(np.mean(ref_binary_loss(pred, target, gamma=lc.gamma, b_range=lc.b_range)))
    enc = fwd["enc"]
    if mcfg.variational:
        if mcfg.prior_category is not None or mcfg.prior_inst is not None:
            kl = 0.0
            if mcfg.prior_category is not None:
                mc, lvc = fwd["prior_cat"]
                m = enc.mean_category if enc.mean_category is not None else enc.mean_inst
                lv = enc.log_var_category if enc.log_var_category is not None else enc.log_var_inst
                kl += float(np.mean(ref_kl_loss(
                    np.asarray(m), np.asarray(lv), np.asarray(mc), np.asarray(lvc))))
            if mcfg.prior_inst is not None:
                mi, lvi = fwd["prior_inst"]
                kl += float(np.mean(ref_kl_loss(
                    np.asarray(enc.mean_inst), np.asarray(enc.log_var_inst),
                    np.asarray(mi), np.asarray(lvi))))
        else:
            kl = float(np.mean(ref_kl_loss(
                np.asarray(enc.mean), np.asarray(enc.log_var),
                np.zeros_like(enc.mean), np.zeros_like(enc.log_var))))
        total += lc.kl_weight * kl
    if mcfg.prior_category is not None or mcfg.prior_inst is not None:
        reg = 0.0
        if mcfg.prior_category is not None:
            mc, lvc = fwd["prior_cat"]
            reg += float(np.mean(ref_regulizer_loss(
                np.asarray(mc), np.asarray(lvc),
                lc.reg_margin_scale_category * mc.shape[-1])))
        if mcfg.prior_inst is not None:
            mi, lvi = fwd["prior_inst"]
            gate = (
                np.asarray(batch["category_onehot"]) if mcfg.category_dim > 0 else None
            )
            reg += float(np.mean(ref_regulizer_loss(
                np.asarray(mi), np.asarray(lvi),
                lc.reg_margin_scale_inst * mi.shape[-1], class_input=gate)))
        total += lc.reg_weight * reg
    total += ref_l2(params, lc.l2_weight)
    return total


ARCHETYPES = [
    # (registry name whose LossConfig drives the math, model cfg, batch)
    ("modelnet_nolbo", _vox_cfg(True, True), _vox_batch()),
    ("modelnet_vae", _vox_cfg(True, False), _vox_batch()),
    ("modelnet_ae", _vox_cfg(False, False), _vox_batch()),
    ("ae3d", _vox_cfg(False, False), _vox_batch()),
    ("pascal_nolbo", _dual_image_cfg(), _img_batch()),
    ("pascal_category", _vox_cfg(True, True), _vox_batch()),
    ("kitti_inst_only", _kitti_cfg(), _img_batch(cat=0, inst=3)),
]


class TestReferenceFitTransliteration:
    @pytest.mark.parametrize("name,cfg,batch", ARCHETYPES, ids=[a[0] for a in ARCHETYPES])
    def test_total_loss_matches_reference_formula(self, name, cfg, batch):
        lc = configs.loss_config(name)
        model = MultiModalVAE(cfg)
        state = create_train_state(model, batch["input"], jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(42)
        # same (model, params, batch, key) -> _encode_and_sample reproduces
        # exactly the forward tensors compute_losses used internally
        fwd = _encode_and_sample(model, lc, state.params, batch, key, False)
        total, metrics = compute_losses(model, lc, state.params, batch, key, False)
        expected = _expected_total(model, lc, state.params, batch, fwd)
        np.testing.assert_allclose(float(total), expected, rtol=2e-5)

    def test_input_remap_changes_encoding_only(self):
        """ae3d: encoder input is 2x-1 (AE3D.py:69-70) while the BCE target
        stays [0,1] — remap on vs off must change the prediction, and the
        remapped target must NOT be used in the loss."""
        cfg = _vox_cfg(False, False)
        batch = _vox_batch()
        model = MultiModalVAE(cfg)
        state = create_train_state(model, batch["input"], jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(7)
        lc_remap = configs.loss_config("ae3d")
        lc_plain = LossConfig(l2_weight=0.0)
        f_remap = _encode_and_sample(model, lc_remap, state.params, batch, key, False)
        f_plain = _encode_and_sample(model, lc_plain, state.params, batch, key, False)
        assert not np.allclose(np.asarray(f_remap["pred"]), np.asarray(f_plain["pred"]))
        t, _ = compute_losses(model, lc_remap, state.params, batch, key, False)
        exp = float(np.mean(ref_binary_loss(
            np.asarray(f_remap["pred"]), np.asarray(batch["target"]))))
        np.testing.assert_allclose(float(t), exp, rtol=2e-5)

    def test_kitti_whole_vector_swap(self):
        """mix_element_prob=1.0 + a forced coin: the decoder input must be
        exactly the prior sample (nolbo.py:383-386), not an element mix."""
        cfg = _kitti_cfg()
        batch = _img_batch(cat=0, inst=3)
        model = MultiModalVAE(cfg)
        state = create_train_state(model, batch["input"], jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(3)
        lc = LossConfig(mix_coin_prob=1.0, mix_element_prob=1.0)
        fwd = _encode_and_sample(model, lc, state.params, batch, key, False)
        # reproduce the prior draw with the step's own key schedule
        k_prior_inst = jax.random.split(key, 7)[3]
        from anytime3d_tpu.ops.sampling import reparameterize
        mi, lvi = fwd["prior_inst"]
        z_prior = reparameterize(k_prior_inst, mi, lvi)
        np.testing.assert_allclose(np.asarray(fwd["z"]), np.asarray(z_prior), rtol=1e-6)

    def test_mix_coin_zero_keeps_posterior(self):
        cfg = _kitti_cfg()
        batch = _img_batch(cat=0, inst=3)
        model = MultiModalVAE(cfg)
        state = create_train_state(model, batch["input"], jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(3)
        fwd = _encode_and_sample(
            model, LossConfig(mix_coin_prob=0.0), state.params, batch, key, False
        )
        k_inst = jax.random.split(key, 7)[1]
        from anytime3d_tpu.ops.sampling import reparameterize
        z_post = reparameterize(k_inst, fwd["enc"].mean_inst, fwd["enc"].log_var_inst)
        np.testing.assert_allclose(np.asarray(fwd["z"]), np.asarray(z_post), rtol=1e-6)


# --------------------------------------------------------------------------
# RNG hygiene lint: no PRNG key feeds two independent draws
# --------------------------------------------------------------------------

class TestKeyReuseLint:
    def _record_keys(self, monkeypatch, module):
        import anytime3d_tpu.ops.sampling as sampling
        seen = []
        real = sampling.reparameterize

        def spy(key, mean, log_var):
            seen.append(tuple(np.asarray(jax.random.key_data(key)).ravel().tolist()))
            return real(key, mean, log_var)

        monkeypatch.setattr(module, "reparameterize", spy)
        return seen

    def test_train_step_keys_distinct(self, monkeypatch):
        import anytime3d_tpu.train.step as step_mod
        seen = self._record_keys(monkeypatch, step_mod)
        cfg = _dual_image_cfg()
        batch = _img_batch()
        model = MultiModalVAE(cfg)
        state = create_train_state(model, batch["input"], jax.random.PRNGKey(0))
        lc = configs.loss_config("pascal_nolbo")
        compute_losses(model, lc, state.params, batch, jax.random.PRNGKey(11), False)
        # 2 posterior draws + 2 prior draws, all under distinct keys
        assert len(seen) == 4
        assert len(set(seen)) == len(seen), f"reused PRNG keys: {seen}"

    def test_anytime_eval_keys_distinct(self, monkeypatch):
        import anytime3d_tpu.anytime.engine as engine_mod
        from anytime3d_tpu.anytime import anytime_eval
        seen = self._record_keys(monkeypatch, engine_mod)
        cfg = _dual_image_cfg()
        batch = _img_batch()
        model = MultiModalVAE(cfg)
        state = create_train_state(model, batch["input"], jax.random.PRNGKey(0))
        anytime_eval(model, state.params, batch, jax.random.PRNGKey(5), missing_prob=0.5)
        assert len(seen) >= 2
        assert len(set(seen)) == len(seen), f"reused PRNG keys: {seen}"
