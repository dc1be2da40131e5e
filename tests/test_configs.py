"""Registry smoke tests: every named reference experiment stays constructible.

Reference: the per-script config dicts of the 17 train_*.py entry scripts
(e.g. train_modelnet_category.py:107-139, train_pascal.py:173-214,
train_kitti.py:131-164) — collapsed here into models/configs.py::REGISTRY.
"""

from anytime3d_tpu.models import configs


class TestRegistry:
    def test_all_reference_experiments_present(self):
        # one entry per reference model class / train-script family
        expected = {
            "modelnet_nolbo",      # train_modelnet_category.py
            "modelnet_nolbo_dr",   # train_modelnet_category_dr.py
            "modelnet_vae",        # train_modelnet_category_VAE.py
            "modelnet_vae_dr",     # train_modelnet_category_VAE_dr.py
            "modelnet_ae",         # train_modelnet_category_AE.py
            "modelnet_ae_dr",      # train_modelnet_category_AE_dr.py
            "ae3d",                # train_modelnet_AE.py (distributed)
            "pascal_nolbo",        # train_pascal.py
            "pascal_category",     # train_pascal_category.py
            "pascal_vae",          # train_pascal_VAE.py
            "pascal_vae_dr",       # train_pascal_VAE_dr.py
            "pascal_ae",           # train_pascal_AE.py
            "pascal_ae_dr",        # train_pascal_AE_dr.py
            "kitti_inst_only",     # train_kitti.py
        }
        assert expected <= set(configs.REGISTRY)

    def test_all_configs_construct(self):
        for name, factory in configs.REGISTRY.items():
            cfg = factory()
            assert cfg.decoder.output_shape[-1] == 1, name
            # every decoder is the shared 64^3 voxel decoder
            assert cfg.decoder.output_shape[:3] == (64, 64, 64), name

    def test_dr_variants_set_latent_dropout(self):
        for name in ("modelnet_nolbo_dr", "modelnet_vae_dr", "modelnet_ae_dr",
                     "pascal_vae_dr", "pascal_ae_dr"):
            assert configs.REGISTRY[name]().latent_dropout, name
            base = configs.REGISTRY[name.removesuffix("_dr")]()
            assert not base.latent_dropout, name
