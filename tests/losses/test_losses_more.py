import numpy as np

import jax
import jax.numpy as jnp

from qflux_tpu.losses import AttentionMaskMseLoss, MaskEditLoss, MseLoss


def test_reductions_consistency():
    key = jax.random.PRNGKey(0)
    pred = jax.random.normal(key, (2, 5, 3))
    tgt = jax.random.normal(jax.random.fold_in(key, 1), (2, 5, 3))

    none = MseLoss(reduction="none")(pred, tgt)
    assert none.shape == (2, 5, 3)
    s = MseLoss(reduction="sum")(pred, tgt)
    np.testing.assert_allclose(float(s), float(none.sum()), rtol=1e-6)
    m = MseLoss(reduction="mean")(pred, tgt)
    np.testing.assert_allclose(float(m), float(none.mean()), rtol=1e-6)


def test_mask_edit_defaults_equal_uniform_weighting():
    """No edit mask + fg == bg ⇒ identical to plain MSE."""
    key = jax.random.PRNGKey(2)
    pred = jax.random.normal(key, (2, 4, 3))
    tgt = jnp.zeros((2, 4, 3))
    l1 = MaskEditLoss(foreground_weight=1.0, background_weight=1.0)(pred, tgt)
    l2 = MseLoss()(pred, tgt)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_attention_mask_loss_sum_and_none():
    pred = jnp.ones((1, 4, 2))
    tgt = jnp.zeros((1, 4, 2))
    am = jnp.array([[1, 1, 0, 0]], jnp.float32)
    fn_none = AttentionMaskMseLoss(reduction="none")
    per_token = fn_none(pred, tgt, attention_mask=am)
    np.testing.assert_allclose(np.asarray(per_token), [[1, 1, 0, 0]])
    fn_sum = AttentionMaskMseLoss(reduction="sum")
    assert float(fn_sum(pred, tgt, attention_mask=am)) == 2.0


def test_losses_are_jittable_and_differentiable():
    for fn in (MseLoss(), MaskEditLoss(), AttentionMaskMseLoss()):
        def loss(pred):
            return fn(pred, jnp.zeros_like(pred),
                      attention_mask=jnp.ones((2, 4)),
                      edit_mask=jnp.ones((2, 4)))
        g = jax.jit(jax.grad(loss))(jnp.ones((2, 4, 3)))
        assert np.isfinite(np.asarray(g)).all()
