import jax
import jax.numpy as jnp
import numpy as np

from qflux_tpu.losses import AttentionMaskMseLoss, MaskEditLoss, MseLoss, map_mask_to_latent


def test_mse_matches_numpy():
    key = jax.random.PRNGKey(0)
    pred = jax.random.normal(key, (2, 10, 4))
    tgt = jax.random.normal(jax.random.fold_in(key, 1), (2, 10, 4))
    loss = MseLoss()(pred, tgt)
    np.testing.assert_allclose(float(loss), np.mean((np.asarray(pred) - np.asarray(tgt)) ** 2), rtol=1e-6)


def test_mse_weighted_reduction():
    """Weighted path: per-sample mean then batch mean (reference mse_loss.py:79-84)."""
    pred = jnp.ones((2, 3, 2))
    tgt = jnp.zeros((2, 3, 2))
    w = jnp.stack([jnp.full((3, 1), 2.0), jnp.full((3, 1), 4.0)])
    loss = MseLoss()(pred, tgt, weighting=w)
    assert np.isclose(float(loss), (2.0 + 4.0) / 2)


def test_mask_edit_loss_foreground_weighting():
    pred = jnp.ones((1, 4, 2))
    tgt = jnp.zeros((1, 4, 2))
    em = jnp.array([[1.0, 1.0, 0.0, 0.0]])
    loss = MaskEditLoss(foreground_weight=3.0, background_weight=1.0)(pred, tgt, edit_mask=em)
    assert np.isclose(float(loss), (3 + 3 + 1 + 1) / 4)


def test_attention_mask_loss_ignores_padding():
    key = jax.random.PRNGKey(0)
    pred = jax.random.normal(key, (2, 6, 4))
    tgt = jax.random.normal(jax.random.fold_in(key, 1), (2, 6, 4))
    am = jnp.array([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], dtype=jnp.float32)
    loss_fn = AttentionMaskMseLoss()
    # corrupting padded tokens must not change the loss
    base = float(loss_fn(pred, tgt, attention_mask=am))
    pred2 = pred.at[0, 3:].set(100.0)
    assert np.isclose(float(loss_fn(pred2, tgt, attention_mask=am)), base)
    # channel-invariance: same values with channel dim doubled → same loss
    pred_d = jnp.concatenate([pred, pred], axis=-1)
    tgt_d = jnp.concatenate([tgt, tgt], axis=-1)
    assert np.isclose(float(loss_fn(pred_d, tgt_d, attention_mask=am)), base, rtol=1e-6)


def test_map_mask_to_latent_shapes_and_max():
    # 32x48 image → latent 4x6 → packed 2x3 = 6 tokens
    m = jnp.zeros((1, 32, 48))
    m = m.at[0, :8, :8].set(1.0)  # one latent cell fully on
    out = map_mask_to_latent(m)
    assert out.shape == (1, 6)
    assert float(out[0, 0]) == 1.0  # max over the 2x2 patch keeps it
    assert float(out[0, 5]) == 0.0
