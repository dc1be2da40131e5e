"""Reconstruction artifact dumping for offline PR-curve analysis.

Reference semantics: test_modelnet_3D.py:117-143 / test_pascal_3D.py:144-173
dump GT/pred voxel grids (as txt) across missing rates {0.3, 0.5, 0.7, 0.9}
comparing mVAE vs mVAE-corrected vs AE vs VAE; the notebooks then sweep
decode thresholds. Here dumps are .npz (grids + metadata) and the threshold
sweep is available on-device (evaluation.pr_curve) — the offline notebook
becomes optional.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from anytime3d_tpu.anytime.engine import classify_by_prior, correct_latent
from anytime3d_tpu.models.mmvae import MultiModalVAE
from anytime3d_tpu.ops.sampling import reparameterize


def dump_reconstructions(
    model: MultiModalVAE,
    params,
    batch: Dict[str, jnp.ndarray],
    out_dir: str,
    rates: Sequence[float] = (0.3, 0.5, 0.7, 0.9),
    prior_means: Optional[jnp.ndarray] = None,
    seed: int = 0,
    tag: str = "model",
) -> Dict[str, str]:
    """Decode the batch at each missing rate (uncorrected + corrected) and
    save grids to ``<out_dir>/<tag>_rate<r>.npz`` with keys gt / pred /
    pred_corrected / mask. Returns {rate: path}."""
    os.makedirs(out_dir, exist_ok=True)
    cfg = model.config
    enc = model.apply({"params": params}, batch["input"], method=MultiModalVAE.encode)
    mean = enc.mean_category if enc.mean_category is not None else enc.mean_inst
    lv = enc.log_var_category if enc.log_var_category is not None else enc.log_var_inst
    if prior_means is None and cfg.prior_category is not None:
        eye = jnp.eye(cfg.prior_category.input_dim, dtype=mean.dtype)
        prior_means, _ = model.apply(
            {"params": params}, eye, method=MultiModalVAE.priors_category
        )

    paths = {}
    gt = np.asarray(batch["target"])
    for rate in rates:
        key = jax.random.PRNGKey(seed + int(rate * 1000))
        k_s, k_m, k_c = jax.random.split(key, 3)
        z = reparameterize(k_s, mean, lv) if lv is not None else mean
        keep = jax.random.bernoulli(k_m, 1.0 - rate, z.shape)
        mask = keep.astype(z.dtype)
        fill = jnp.mean(prior_means, axis=0) if prior_means is not None else 0.0
        z_masked = jnp.where(keep, z, fill)
        pred = model.apply({"params": params}, z_masked, method=MultiModalVAE.decode)
        out = {
            "gt": gt,
            "pred": np.asarray(pred),
            "mask": np.asarray(mask),
            "rate": rate,
        }
        if prior_means is not None:
            z_corr = correct_latent(k_c, z_masked, mask, prior_means)
            out["pred_corrected"] = np.asarray(
                model.apply({"params": params}, z_corr, method=MultiModalVAE.decode)
            )
            out["pred_class"] = np.asarray(classify_by_prior(z_masked, prior_means))
        path = os.path.join(out_dir, f"{tag}_rate{rate:.1f}.npz")
        np.savez_compressed(path, **out)
        paths[str(rate)] = path
    return paths
