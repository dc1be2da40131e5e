"""Feature front-end tests: Harris detection, descriptors, NCC matching.

Oracle style: synthetic images with known corner locations; a translated
copy must match back to the original with the known shift.
"""

import numpy as np
import jax.numpy as jnp

from anytime3d_tpu.geometry.features import (
    detect_keypoints,
    extract_descriptors,
    harris_response,
    match_descriptors,
)


def _checker(h=96, w=96, cell=16, lo=0.1, hi=0.9):
    r = np.arange(h)[:, None] // cell
    c = np.arange(w)[None, :] // cell
    return np.where((r + c) % 2 == 0, hi, lo).astype(np.float32)


def test_harris_response_peaks_at_corners():
    img = _checker()
    resp = np.asarray(harris_response(jnp.asarray(img)))
    # interior cell corners (multiples of 16) must out-respond flat regions
    corner = resp[32 - 2 : 32 + 3, 48 - 2 : 48 + 3].max()
    flat = abs(resp[40, 40])
    assert corner > 10 * max(flat, 1e-12)


def test_detect_keypoints_on_checkerboard():
    img = jnp.asarray(_checker())
    kps = detect_keypoints(img, max_keypoints=64, border=4)
    n = int(kps.valid.sum())
    assert n >= 10
    rc = np.asarray(kps.rowcol)[np.asarray(kps.valid)]
    # every detection within 2 px of a lattice corner (multiple of 16)
    off = np.minimum(rc % 16, 16 - rc % 16)
    assert (off <= 2).all()


def test_detect_keypoints_respects_border_and_capacity():
    img = jnp.asarray(_checker())
    kps = detect_keypoints(img, max_keypoints=8, border=20)
    rc = np.asarray(kps.rowcol)[np.asarray(kps.valid)]
    assert kps.rowcol.shape == (8, 2)
    assert (rc >= 20).all() and (rc < 96 - 20).all()


def test_descriptors_are_normalized():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(64, 64)).astype(np.float32))
    kps = detect_keypoints(img, max_keypoints=32, border=8, threshold=-1e9)
    d = np.asarray(extract_descriptors(img, kps))
    v = np.asarray(kps.valid)
    norms = np.linalg.norm(d[v], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    assert np.abs(d[v].sum(axis=-1)).max() < 1e-3  # zero mean
    assert (d[~v] == 0).all()


def test_matching_recovers_translation():
    rng = np.random.default_rng(1)
    base = rng.uniform(size=(140, 140)).astype(np.float32)
    # smooth a little so patches are distinctive but not pure noise
    k = np.ones((3, 3)) / 9.0
    from scipy.signal import convolve2d

    base = convolve2d(base, k, mode="same").astype(np.float32)
    shift = 5
    img_a = jnp.asarray(base[:128, :128])
    img_b = jnp.asarray(base[shift : 128 + shift, shift : 128 + shift])

    ka = detect_keypoints(img_a, max_keypoints=128, border=10, threshold=-1e9)
    kb = detect_keypoints(img_b, max_keypoints=128, border=10, threshold=-1e9)
    da = extract_descriptors(img_a, ka)
    db = extract_descriptors(img_b, kb)
    m = match_descriptors(da, db, ka.valid, kb.valid, min_score=0.9)

    v = np.asarray(m.valid)
    assert v.sum() >= 10
    rc_a = np.asarray(ka.rowcol)[np.asarray(m.index_a)[v]]
    rc_b = np.asarray(kb.rowcol)[np.asarray(m.index_b)[v]]
    d = rc_a - rc_b  # b is the same content shifted by +shift in image coords
    good = (np.abs(d - shift) <= 1).all(axis=-1)
    assert good.mean() >= 0.8


def test_matching_rejects_unrelated_images():
    rng = np.random.default_rng(2)
    img_a = jnp.asarray(rng.uniform(size=(96, 96)).astype(np.float32))
    img_b = jnp.asarray(rng.uniform(size=(96, 96)).astype(np.float32))
    ka = detect_keypoints(img_a, max_keypoints=64, border=8, threshold=-1e9)
    kb = detect_keypoints(img_b, max_keypoints=64, border=8, threshold=-1e9)
    da = extract_descriptors(img_a, ka)
    db = extract_descriptors(img_b, kb)
    m = match_descriptors(da, db, ka.valid, kb.valid, min_score=0.9, ratio=0.8)
    assert int(m.valid.sum()) <= 5
