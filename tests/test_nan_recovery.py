"""Failure-recovery test: NaN -> checkpoint restore -> continue."""

import jax
import jax.numpy as jnp
import numpy as np

from anytime3d_tpu.models.mmvae import MultiModalVAE
from anytime3d_tpu.train import create_train_state
from anytime3d_tpu.train.trainer import Trainer, TrainerConfig

from tests.test_train import synth_batch, tiny_voxel_cfg


def test_nan_restart_restores_and_continues(tmp_path):
    model = MultiModalVAE(tiny_voxel_cfg(variational=False))
    batch = synth_batch(n=4)
    state = create_train_state(model, batch["input"], jax.random.PRNGKey(0))

    poisoned_steps = {5}

    def batch_fn(it):
        if it in poisoned_steps:
            poisoned_steps.discard(it)  # poison once, then heal
            bad = dict(batch)
            bad["input"] = batch["input"] * jnp.nan
            return bad
        return batch

    trainer = Trainer(
        model,
        state,
        batch_fn=batch_fn,
        config=TrainerConfig(
            total_steps=8,
            save_every=2,
            save_path=str(tmp_path / "ckpt"),
            max_nan_restarts=2,
        ),
    )
    final = trainer.run()
    assert not trainer.aborted_nan
    assert int(final.step) == 8
    # history contains the NaN step plus the replayed steps
    nan_steps = [h for h in trainer.history if not np.isfinite(h["loss_total"])]
    assert len(nan_steps) == 1


def test_nan_without_restart_budget_aborts(tmp_path):
    model = MultiModalVAE(tiny_voxel_cfg(variational=False))
    batch = synth_batch(n=4)
    state = create_train_state(model, batch["input"], jax.random.PRNGKey(0))
    bad = dict(batch)
    bad["input"] = batch["input"] * jnp.nan
    trainer = Trainer(
        model, state, batch_fn=lambda it: bad,
        config=TrainerConfig(total_steps=4, max_nan_restarts=0),
    )
    trainer.run()
    assert trainer.aborted_nan


def test_nan_between_log_ticks_never_poisons_checkpoint(tmp_path):
    """NaN detection runs on the LOG cadence; saves run on their own cadence.
    A NaN hitting between log ticks must not be checkpointed (r2 review):
    otherwise the restart mechanism restores the poison and every restart
    re-NaNs immediately."""
    model = MultiModalVAE(tiny_voxel_cfg(variational=False))
    batch = synth_batch(n=4)
    state = create_train_state(model, batch["input"], jax.random.PRNGKey(0))

    poisoned_steps = {5}  # between the log ticks at 4 and 8

    def batch_fn(it):
        if it in poisoned_steps:
            poisoned_steps.discard(it)  # poison once, then heal
            bad = dict(batch)
            bad["input"] = batch["input"] * jnp.nan
            return bad
        return batch

    trainer = Trainer(
        model,
        state,
        batch_fn=batch_fn,
        config=TrainerConfig(
            total_steps=12,
            save_every=1,   # would have saved the NaN state at steps 5..7
            log_every=4,    # NaN only DETECTED at step 8
            save_path=str(tmp_path / "ckpt"),
            max_nan_restarts=2,
        ),
    )
    final = trainer.run()
    assert not trainer.aborted_nan
    assert int(final.step) == 12
    # the final (finite) state implies the restored checkpoint was pre-NaN
    assert np.isfinite(trainer.history[-1]["loss_total"])
