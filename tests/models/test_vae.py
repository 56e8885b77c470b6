"""FLUX VAE: shape/determinism tests + parity against a torch oracle built
from the same primitives diffusers' AutoencoderKL uses (GroupNorm → SiLU →
Conv 3×3, asymmetric-pad strided downsample, single-head mid attention)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from qflux_tpu.models.flux import vae as jvae


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(a) + np.linalg.norm(b) + 1e-12)


@pytest.fixture(scope="module")
def tiny_vae():
    cfg = jvae.VAEConfig.tiny()
    params = jvae.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


def test_encode_decode_shapes(tiny_vae):
    cfg, params = tiny_vae
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 48, 3))
    lat = jvae.encode(params, cfg, img)
    assert lat.shape == (2, 16, 24, cfg.latent_channels)  # /2 per extra block
    out = jvae.decode(params, cfg, lat)
    assert out.shape == (2, 32, 48, 3)
    # deterministic encode (mode of the latent dist): identical on repeat
    lat2 = jvae.encode(params, cfg, img)
    np.testing.assert_array_equal(np.asarray(lat), np.asarray(lat2))


# ---------------------------------------------------------------------------
# torch oracle for the layout-sensitive pieces

def _t(x):  # NHWC → NCHW torch tensor (copy: jax arrays are non-writable)
    return torch.from_numpy(np.array(x)).permute(0, 3, 1, 2).contiguous()


def _n(x):  # NCHW torch → NHWC numpy
    return x.detach().permute(0, 2, 3, 1).numpy()


def _torch_conv(p, x, stride=1, padding=1):
    w = torch.from_numpy(np.asarray(p["kernel"])).permute(3, 2, 0, 1)  # HWIO→OIHW
    return F.conv2d(x, w, torch.from_numpy(np.asarray(p["bias"])), stride=stride,
                    padding=padding)


def _torch_gn(p, x, groups):
    return F.group_norm(x, groups, torch.from_numpy(np.asarray(p["scale"])),
                        torch.from_numpy(np.asarray(p["bias"])), eps=1e-6)


def test_resnet_block_matches_torch(tiny_vae):
    cfg, params = tiny_vae
    p = params["encoder"]["down_0"]["resnets_0"]
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 8))
    mine = np.asarray(jvae._resnet(p, x, cfg.norm_num_groups))

    xt = _t(x)
    h = _torch_conv(p["conv1"], F.silu(_torch_gn(p["norm1"], xt, cfg.norm_num_groups)))
    h = _torch_conv(p["conv2"], F.silu(_torch_gn(p["norm2"], h, cfg.norm_num_groups)))
    ref = _n(xt + h)
    assert rel_err(mine, ref) < 1e-5


def test_downsample_asymmetric_padding(tiny_vae):
    """diffusers Downsample2d pads (0,1,0,1) then convs stride 2 VALID — the
    encoder must reproduce exactly that, not SAME padding."""
    cfg, params = tiny_vae
    blk = params["encoder"]["down_0"]
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 8))
    # run just the downsample piece via the public encode on a crafted input is
    # awkward; replicate inline instead:
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    mine = jax.lax.conv_general_dilated(
        xp, blk["downsample"]["kernel"], (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + blk["downsample"]["bias"]

    xt = F.pad(_t(x), (0, 1, 0, 1))
    ref = _torch_conv(blk["downsample"], xt, stride=2, padding=0)
    assert rel_err(np.asarray(mine), _n(ref)) < 1e-5
    assert mine.shape == (1, 8, 8, 8)


def test_attn_block_matches_torch(tiny_vae):
    cfg, params = tiny_vae
    p = params["encoder"]["mid"]["attentions_0"]
    c = cfg.block_out_channels[-1]
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, c))
    mine = np.asarray(jvae._attn_block(p, x, cfg.norm_num_groups))

    xt = _t(x)
    y = _torch_gn(p["group_norm"], xt, cfg.norm_num_groups)
    b, ch, h, w = y.shape
    y = y.reshape(b, ch, h * w).transpose(1, 2)  # [B, HW, C]
    lin = lambda q, v: v @ torch.from_numpy(np.asarray(q["kernel"])) + torch.from_numpy(np.asarray(q["bias"]))
    q, k, v = lin(p["to_q"], y), lin(p["to_k"], y), lin(p["to_v"], y)
    o = F.scaled_dot_product_attention(q[:, None], k[:, None], v[:, None])[:, 0]
    o = lin(p["to_out"], o)
    ref = _n(xt + o.transpose(1, 2).reshape(b, ch, h, w))
    assert rel_err(mine, ref) < 1e-5


def test_vae_converter_roundtrip():
    """Synthetic diffusers-style state dict converts and runs."""
    from qflux_tpu.models.porting import convert_flux_vae

    cfg = jvae.VAEConfig.tiny()
    rng = np.random.default_rng(0)
    sd = {}

    def conv_(name, ci, co, k=3):
        sd[f"{name}.weight"] = rng.normal(size=(co, ci, k, k)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = rng.normal(size=(co,)).astype(np.float32) * 0.05

    def gn_(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)

    def lin_(name, ci, co):
        sd[f"{name}.weight"] = rng.normal(size=(co, ci)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros(co, np.float32)

    def resnet_(name, ci, co):
        gn_(f"{name}.norm1", ci); conv_(f"{name}.conv1", ci, co)
        gn_(f"{name}.norm2", co); conv_(f"{name}.conv2", co, co)
        if ci != co:
            conv_(f"{name}.conv_shortcut", ci, co, k=1)

    def mid_(name, c):
        resnet_(f"{name}.resnets.0", c, c)
        resnet_(f"{name}.resnets.1", c, c)
        gn_(f"{name}.attentions.0.group_norm", c)
        for m in ("to_q", "to_k", "to_v"):
            lin_(f"{name}.attentions.0.{m}", c, c)
        lin_(f"{name}.attentions.0.to_out.0", c, c)

    ch = cfg.block_out_channels
    conv_("encoder.conv_in", 3, ch[0])
    cin = ch[0]
    for i, co in enumerate(ch):
        resnet_(f"encoder.down_blocks.{i}.resnets.0", cin, co)
        if i < len(ch) - 1:
            conv_(f"encoder.down_blocks.{i}.downsamplers.0.conv", co, co)
        cin = co
    mid_("encoder.mid_block", ch[-1])
    gn_("encoder.conv_norm_out", ch[-1])
    conv_("encoder.conv_out", ch[-1], 2 * cfg.latent_channels)
    conv_("decoder.conv_in", cfg.latent_channels, ch[-1])
    mid_("decoder.mid_block", ch[-1])
    rev = list(reversed(ch))
    cin = ch[-1]
    for i, co in enumerate(rev):
        for j in range(cfg.layers_per_block + 1):
            resnet_(f"decoder.up_blocks.{i}.resnets.{j}", cin if j == 0 else co, co)
        if i < len(rev) - 1:
            conv_(f"decoder.up_blocks.{i}.upsamplers.0.conv", co, co)
        cin = co
    gn_("decoder.conv_norm_out", ch[0])
    conv_("decoder.conv_out", ch[0], cfg.out_channels)

    params = convert_flux_vae(sd, num_blocks=len(ch), layers_per_block=cfg.layers_per_block)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    lat = jvae.encode(params, cfg, img)
    out = jvae.decode(params, cfg, lat)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_convert_qwen_vae_roundtrip(rng):
    """Round 3: the WanVAE-layout converter (diffusers AutoencoderKLQwenImage
    flat ModuleLists) reconstructs the exact per-level tree — verified by
    serializing a tiny init tree into Wan key layout and converting back."""
    import jax
    import jax.numpy as jnp

    from qflux_tpu.models.qwen import vae as qwen_vae
    from qflux_tpu.models.qwen.porting import convert_qwen_vae

    cfg = qwen_vae.QwenVAEConfig.tiny()
    tree = qwen_vae.init(jax.random.PRNGKey(0), cfg)
    levels, nres = len(cfg.dim_mult), cfg.num_res_blocks

    sd = {}

    def put_c3(base, p):
        sd[f"{base}.weight"] = np.asarray(p["kernel"]).transpose(4, 3, 0, 1, 2)
        sd[f"{base}.bias"] = np.asarray(p["bias"])

    def put_c2(base, p):
        sd[f"{base}.weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
        sd[f"{base}.bias"] = np.asarray(p["bias"])

    def put_res(base, p):
        sd[f"{base}.norm1.gamma"] = np.asarray(p["norm1"]["gamma"])[:, None, None]
        put_c3(f"{base}.conv1", p["conv1"])
        sd[f"{base}.norm2.gamma"] = np.asarray(p["norm2"]["gamma"])[:, None, None]
        put_c3(f"{base}.conv2", p["conv2"])
        if "conv_shortcut" in p:
            put_c3(f"{base}.conv_shortcut", p["conv_shortcut"])

    def put_lin1x1(base, p):
        k = np.asarray(p["kernel"])  # [cin, cout] -> conv [cout, cin, 1, 1]
        sd[f"{base}.weight"] = k.T[:, :, None, None]
        sd[f"{base}.bias"] = np.asarray(p["bias"])

    def put_mid(base, p):
        put_res(f"{base}.resnets.0", p["res_0"])
        sd[f"{base}.attentions.0.norm.gamma"] = np.asarray(
            p["attn"]["norm"]["gamma"])[:, None, None]
        put_lin1x1(f"{base}.attentions.0.to_qkv", p["attn"]["to_qkv"])
        put_lin1x1(f"{base}.attentions.0.proj", p["attn"]["proj"])
        put_res(f"{base}.resnets.1", p["res_1"])

    enc = tree["encoder"]
    put_c3("encoder.conv_in", enc["conv_in"])
    k = 0
    for i in range(levels):
        for j in range(nres):
            put_res(f"encoder.down_blocks.{k}", enc[f"down_{i}"][f"res_{j}"])
            k += 1
        if i < levels - 1:
            put_c2(f"encoder.down_blocks.{k}.resample.1", enc[f"down_{i}"]["down"])
            # a 3D resample's temporal conv — must be skipped by the converter
            sd[f"encoder.down_blocks.{k}.time_conv.weight"] = np.zeros((1,))
            sd[f"encoder.down_blocks.{k}.time_conv.bias"] = np.zeros((1,))
            k += 1
    put_mid("encoder.mid_block", enc["mid"])
    sd["encoder.norm_out.gamma"] = np.asarray(enc["norm_out"]["gamma"])[:, None, None]
    put_c3("encoder.conv_out", enc["conv_out"])
    # quant convs (identity-ish linears)
    z2 = 2 * cfg.z_dim
    sd["quant_conv.weight"] = np.eye(z2, dtype=np.float32)[:, :, None, None, None]
    sd["quant_conv.bias"] = np.zeros((z2,), np.float32)

    dec = tree["decoder"]
    put_c3("decoder.conv_in", dec["conv_in"])
    put_mid("decoder.mid_block", dec["mid"])
    k = 0
    for i in range(levels):
        for j in range(nres + 1):
            put_res(f"decoder.up_blocks.{k}", dec[f"up_{i}"][f"res_{j}"])
            k += 1
        if i < levels - 1:
            put_c2(f"decoder.up_blocks.{k}.resample.1", dec[f"up_{i}"]["up"])
            k += 1
    sd["decoder.norm_out.gamma"] = np.asarray(dec["norm_out"]["gamma"])[:, None, None]
    put_c3("decoder.conv_out", dec["conv_out"])
    sd["post_quant_conv.weight"] = np.eye(cfg.z_dim, dtype=np.float32)[:, :, None, None, None]
    sd["post_quant_conv.bias"] = np.zeros((cfg.z_dim,), np.float32)

    got = convert_qwen_vae(sd, num_res_blocks=nres, levels=levels)

    # identical numerical tree (quant convs excepted — identity by design)
    flat_a = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat_a:
        node = got
        for p in path:
            node = node[p.key]
        np.testing.assert_array_equal(np.asarray(node), np.asarray(leaf),
                                      err_msg=str(path))

    # with identity quant convs, encode/decode equal the unconverted model
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    a = qwen_vae.encode(tree, cfg, x)
    b = qwen_vae.encode(got, cfg, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    da = qwen_vae.decode(tree, cfg, a)
    db = qwen_vae.decode(got, cfg, b)
    np.testing.assert_allclose(np.asarray(da), np.asarray(db), atol=1e-5)


def test_flux_attn_chunked_matches_naive(monkeypatch):
    """Query-chunked spatial attention (large grids; found by driving
    validation at a size whose [S,S] f32 scores OOM) is numerically the
    naive path."""
    import jax
    import jax.numpy as jnp

    from qflux_tpu.models.flux import vae as fvae

    c, h, w = 8, 8, 16  # s=128
    p = fvae._attn_init(jax.random.PRNGKey(0), c, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, c), jnp.float32)
    ref = fvae._attn_block(p, x, groups=4)          # s <= chunk: naive
    monkeypatch.setattr(fvae, "ATTN_CHUNK", 32)     # force 4 chunks
    out = fvae._attn_block(p, x, groups=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_qwen_attn_chunked_matches_naive(monkeypatch):
    import jax
    import jax.numpy as jnp

    from qflux_tpu.models.flux import vae as fvae
    from qflux_tpu.models.qwen import vae as qvae

    c, h, w = 8, 8, 16
    p = qvae._attn_init(jax.random.PRNGKey(0), c, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, c), jnp.float32)
    ref = qvae._attn_block(p, x)
    monkeypatch.setattr(fvae, "ATTN_CHUNK", 32)  # qwen reads flux's constant
    out = qvae._attn_block(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
