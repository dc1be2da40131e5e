"""Trainer loop, evaluation protocols, logging, and CLI adapter tests."""

import json
import math

import jax
import jax.numpy as jnp
import numpy as np

from anytime3d_tpu.evaluation import category_vectors, missing_rate_sweep, pr_curve
from anytime3d_tpu.models.mmvae import MultiModalVAE
from anytime3d_tpu.train import LossConfig, create_train_state
from anytime3d_tpu.train.trainer import Trainer, TrainerConfig, multi_scale_schedule
from anytime3d_tpu.utils.logging import MetricLogger

from tests.test_train import synth_batch, tiny_voxel_cfg


def _setup(with_prior=True):
    model = MultiModalVAE(tiny_voxel_cfg(variational=True, with_prior=with_prior))
    batch = synth_batch(n=8)
    state = create_train_state(model, batch["input"], jax.random.PRNGKey(0), learning_rate=3e-3)
    return model, state, batch


class TestTrainer:
    def test_runs_and_improves(self, tmp_path):
        model, state, batch = _setup()
        trainer = Trainer(
            model,
            state,
            batch_fn=lambda it: batch,
            eval_batch_fn=lambda it: batch,
            config=TrainerConfig(
                total_steps=10,
                eval_every=5,
                save_every=100,
                save_path=str(tmp_path / "ckpt"),
                jsonl_path=str(tmp_path / "log.jsonl"),
            ),
        )
        final = trainer.run()
        assert int(final.step) == 10
        assert trainer.history[-1]["loss_shape"] < trainer.history[0]["loss_shape"]
        # jsonl written
        lines = (tmp_path / "log.jsonl").read_text().strip().splitlines()
        assert len(lines) == 10
        rec = json.loads(lines[0])
        assert "loss_total" in rec and rec["step"] == 0
        # final checkpoint saved
        assert (tmp_path / "ckpt").exists()

    def test_nan_abort(self):
        model, state, batch = _setup()
        # poison params to force NaN
        bad_params = jax.tree_util.tree_map(lambda x: x * jnp.nan, state.params)
        state = state.replace(params=bad_params)
        trainer = Trainer(model, state, batch_fn=lambda it: batch,
                          config=TrainerConfig(total_steps=5))
        trainer.run()
        assert trainer.aborted_nan
        assert len(trainer.history) == 1

    def test_resume_from_checkpoint(self, tmp_path):
        model, state, batch = _setup()
        path = str(tmp_path / "ckpt")
        t1 = Trainer(model, state, batch_fn=lambda it: batch,
                     config=TrainerConfig(total_steps=4, save_path=path, save_every=100))
        t1.run()
        state2 = create_train_state(model, batch["input"], jax.random.PRNGKey(1))
        t2 = Trainer(model, state2, batch_fn=lambda it: batch,
                     config=TrainerConfig(total_steps=6, load_path=path))
        final = t2.run()
        assert int(final.step) == 6
        assert len(t2.history) == 2  # resumed at step 4


class TestMultiScaleSchedule:
    def test_deterministic_and_covers_all(self):
        sizes = [(64, 64, 32), (96, 96, 16), (128, 128, 8)]
        picks = [multi_scale_schedule(sizes, it, period=3, seed=0) for it in range(9)]
        # same size held for `period` consecutive iterations
        assert picks[0] == picks[1] == picks[2]
        assert picks[3] == picks[4] == picks[5]
        # all sizes covered in one block
        assert {p[0] for p in picks} == {64, 96, 128}
        # deterministic
        again = [multi_scale_schedule(sizes, it, period=3, seed=0) for it in range(9)]
        assert picks == again


class TestEvaluationProtocols:
    def test_missing_rate_sweep_shape(self):
        model, state, batch = _setup()
        table = missing_rate_sweep(
            model, state.params, lambda b: batch, rates=(0.3, 0.7), num_batches=2
        )
        assert set(table) == {0.3, 0.7}
        for rate, metrics in table.items():
            assert "precision" in metrics and "precision_corrected" in metrics

    def test_pr_curve_monotone_recall(self):
        rng = np.random.default_rng(0)
        target = jnp.asarray((rng.uniform(size=(4, 8, 8, 8, 1)) > 0.5).astype(np.float32))
        pred = jnp.asarray(rng.uniform(size=(4, 8, 8, 8, 1)).astype(np.float32))
        curve = pr_curve(target, pred)
        # recall decreases as threshold rises
        assert (np.diff(curve["recall"]) <= 1e-6).all()
        assert curve["precision"].shape == curve["threshold"].shape

    def test_pr_curve_acceptance_tail(self):
        """modelnetAE3.ipynb cell 2: the tail keeps only saturating
        predictions (>= 1.0), each accepted with prob 0.1**i — row i=0
        (accept everything) must match an exact threshold-1.0 row, and
        recall must fall as the acceptance probability shrinks."""
        rng = np.random.default_rng(1)
        pred = rng.uniform(size=(4, 8, 8, 8, 1)).astype(np.float32)
        pred[pred > 0.8] = 1.0  # a saturating cluster for the tail to keep
        target = (rng.uniform(size=pred.shape) > 0.5).astype(np.float32)
        curve = pr_curve(jnp.asarray(target), jnp.asarray(pred), acceptance_div=3)
        n_thr = 19
        assert len(curve["precision"]) == n_thr + 3
        assert np.isnan(curve["accept_prob"][:n_thr]).all()
        np.testing.assert_allclose(curve["accept_prob"][n_thr:], [1.0, 0.1, 0.01])
        # i=0 keeps every voxel: identical to a plain threshold-1.0 sweep
        from anytime3d_tpu.ops import voxel_tp_fp_fn

        tp, fp, fn = voxel_tp_fp_fn(jnp.asarray(target), jnp.asarray(pred), 1.0)
        np.testing.assert_allclose(
            curve["recall"][n_thr],
            float(jnp.mean(tp / (tp + fn + 1e-10))),
            rtol=1e-6,
        )
        tail_recall = curve["recall"][n_thr:]
        assert (np.diff(tail_recall) <= 1e-6).all(), tail_recall

    def test_category_vectors(self):
        model, state, batch = _setup()
        vecs = category_vectors(model, state.params, lambda b: batch, num_classes=5, num_batches=2)
        assert vecs.shape == (5, 8)
        assert np.isfinite(vecs).all()


class TestMetricLogger:
    def test_running_means(self, capsys):
        log = MetricLogger()
        log.update({"a": 1.0}, step=0)
        log.update({"a": 3.0}, step=1)
        assert log.means()["a"] == 2.0
        log.reset_epoch()
        assert log.means() == {}


class TestCliAdapters:
    def test_modelnet_dict_adapter(self):
        from anytime3d_tpu.cli.train import build_batch_fn
        from anytime3d_tpu.data import SyntheticVoxelLoader

        cfg = tiny_voxel_cfg(with_prior=True)
        loader = SyntheticVoxelLoader(num_samples=8, dim=16, num_classes=5)
        fn = build_batch_fn(loader, cfg)
        b = fn(0)
        assert b["input"].shape == (32, 16, 16, 16, 1) or b["input"].shape[0] <= 32
        assert "category_onehot" in b
