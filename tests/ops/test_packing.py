import jax
import jax.numpy as jnp
import numpy as np

from qflux_tpu.ops.packing import pack_latents, pixel_to_latent_hw, unpack_latents


def test_pack_unpack_roundtrip():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 12, 16))
    packed = pack_latents(x)
    assert packed.shape == (2, 4 * 6, 64)
    back = unpack_latents(packed, 8, 12)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_pack_matches_reference_layout():
    """Channel order must match diffusers _pack_latents: token channel layout is
    (c, dy, dx)-major, i.e. packed[..., c*4 + dy*2 + dx] = x[c, 2i+dy, 2j+dx]."""
    b, h, w, c = 1, 4, 4, 3
    x = jnp.arange(b * h * w * c, dtype=jnp.float32).reshape(b, h, w, c)
    packed = np.asarray(pack_latents(x))
    xn = np.asarray(x)
    for ti, (i, j) in enumerate([(i, j) for i in range(h // 2) for j in range(w // 2)]):
        for ci in range(c):
            for dy in range(2):
                for dx in range(2):
                    assert packed[0, ti, ci * 4 + dy * 2 + dx] == xn[0, 2 * i + dy, 2 * j + dx, ci]


def test_pixel_to_latent_hw():
    assert pixel_to_latent_hw(512, 512) == (32, 32)
    assert pixel_to_latent_hw(832, 576) == (52, 36)
