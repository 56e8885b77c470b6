"""Minimal faithful stand-ins for the diffusers symbols that the reference's
VENDORED torch DiT files import (reference src/qflux/models/transformer_flux.py:24-66,
transformer_qwenimage.py:24-35).

Purpose: run those vendored modules as a torch ORACLE at tiny width without
diffusers installed, so DiT forward parity of the JAX implementation can be
asserted offline (VERDICT r3 "shrink the real-weights parity IOU").

The math modules (FeedForward, Attention, AdaLayerNorm*, RMSNorm, Timesteps,
TimestepEmbedding, rotary helpers) re-implement the public diffusers behavior
exactly; everything else (mixins, config plumbing) is no-op boilerplate the
vendored files only touch at import/constructor time.
"""

from __future__ import annotations

import functools
import inspect
import math
import sys
import types

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

# ---------------------------------------------------------------------------
# embeddings (diffusers.models.embeddings)


def get_timestep_embedding(timesteps, embedding_dim, flip_sin_to_cos=False,
                           downscale_freq_shift=1, scale=1, max_period=10000):
    assert len(timesteps.shape) == 1
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * torch.arange(half_dim, dtype=torch.float32,
                                                    device=timesteps.device)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = torch.exp(exponent)
    emb = timesteps[:, None].float() * emb[None, :]
    emb = scale * emb
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
    if embedding_dim % 2 == 1:
        emb = F.pad(emb, (0, 1, 0, 0))
    return emb


class Timesteps(nn.Module):
    def __init__(self, num_channels, flip_sin_to_cos, downscale_freq_shift, scale=1):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.downscale_freq_shift = downscale_freq_shift
        self.scale = scale

    def forward(self, timesteps):
        return get_timestep_embedding(timesteps, self.num_channels,
                                      flip_sin_to_cos=self.flip_sin_to_cos,
                                      downscale_freq_shift=self.downscale_freq_shift,
                                      scale=self.scale)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_channels, time_embed_dim, act_fn="silu", out_dim=None):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim)
        self.act = nn.SiLU()
        self.linear_2 = nn.Linear(time_embed_dim, out_dim or time_embed_dim)

    def forward(self, sample):
        return self.linear_2(self.act(self.linear_1(sample)))


class PixArtAlphaTextProjection(nn.Module):
    def __init__(self, in_features, hidden_size, out_features=None, act_fn="silu"):
        super().__init__()
        self.linear_1 = nn.Linear(in_features, hidden_size)
        self.act_1 = nn.SiLU()
        self.linear_2 = nn.Linear(hidden_size, out_features or hidden_size)

    def forward(self, caption):
        return self.linear_2(self.act_1(self.linear_1(caption)))


class CombinedTimestepTextProjEmbeddings(nn.Module):
    def __init__(self, embedding_dim, pooled_projection_dim):
        super().__init__()
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True,
                                   downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=256,
                                                   time_embed_dim=embedding_dim)
        self.text_embedder = PixArtAlphaTextProjection(pooled_projection_dim,
                                                       embedding_dim, act_fn="silu")

    def forward(self, timestep, pooled_projection):
        t = self.timestep_embedder(self.time_proj(timestep).to(pooled_projection.dtype))
        return t + self.text_embedder(pooled_projection)


class CombinedTimestepGuidanceTextProjEmbeddings(nn.Module):
    def __init__(self, embedding_dim, pooled_projection_dim):
        super().__init__()
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True,
                                   downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=256,
                                                   time_embed_dim=embedding_dim)
        self.guidance_embedder = TimestepEmbedding(in_channels=256,
                                                   time_embed_dim=embedding_dim)
        self.text_embedder = PixArtAlphaTextProjection(pooled_projection_dim,
                                                       embedding_dim, act_fn="silu")

    def forward(self, timestep, guidance, pooled_projection):
        t = self.timestep_embedder(self.time_proj(timestep).to(pooled_projection.dtype))
        g = self.guidance_embedder(self.time_proj(guidance).to(pooled_projection.dtype))
        return t + g + self.text_embedder(pooled_projection)


def get_1d_rotary_pos_embed(dim, pos, theta=10000.0, use_real=False,
                            linear_factor=1.0, ntk_factor=1.0,
                            repeat_interleave_real=True,
                            freqs_dtype=torch.float32):
    assert dim % 2 == 0
    if isinstance(pos, int):
        pos = torch.arange(pos)
    if isinstance(pos, np.ndarray):
        pos = torch.from_numpy(pos)
    theta = theta * ntk_factor
    freqs = (1.0 / (theta ** (torch.arange(0, dim, 2, dtype=freqs_dtype,
                                           device=pos.device)[: dim // 2] / dim))
             / linear_factor)
    freqs = torch.outer(pos.to(freqs_dtype), freqs)
    if use_real and repeat_interleave_real:
        cos = freqs.cos().repeat_interleave(2, dim=1).float()
        sin = freqs.sin().repeat_interleave(2, dim=1).float()
        return cos, sin
    if use_real:
        cos = torch.cat([freqs.cos(), freqs.cos()], dim=-1).float()
        sin = torch.cat([freqs.sin(), freqs.sin()], dim=-1).float()
        return cos, sin
    return torch.polar(torch.ones_like(freqs), freqs)


def apply_rotary_emb(x, freqs_cis, use_real=True, use_real_unbind_dim=-1,
                     sequence_dim=2):
    if use_real:
        cos, sin = freqs_cis
        if sequence_dim == 2:
            cos, sin = cos[None, None, :, :], sin[None, None, :, :]
        elif sequence_dim == 1:
            cos, sin = cos[None, :, None, :], sin[None, :, None, :]
        else:
            raise ValueError(f"sequence_dim {sequence_dim}")
        cos, sin = cos.to(x.device), sin.to(x.device)
        if use_real_unbind_dim == -1:
            x_real, x_imag = x.reshape(*x.shape[:-1], -1, 2).unbind(-1)
            x_rotated = torch.stack([-x_imag, x_real], dim=-1).flatten(3)
        elif use_real_unbind_dim == -2:
            x_real, x_imag = x.reshape(*x.shape[:-1], 2, -1).unbind(-2)
            x_rotated = torch.cat([-x_imag, x_real], dim=-1)
        else:
            raise ValueError(f"use_real_unbind_dim {use_real_unbind_dim}")
        return (x.float() * cos + x_rotated.float() * sin).to(x.dtype)
    x_rotated = torch.view_as_complex(x.float().reshape(*x.shape[:-1], -1, 2))
    freqs_cis = freqs_cis.unsqueeze(2)
    return torch.view_as_real(x_rotated * freqs_cis).flatten(3).type_as(x)


# ---------------------------------------------------------------------------
# normalization (diffusers.models.normalization)


class RMSNorm(nn.Module):
    def __init__(self, dim, eps, elementwise_affine=True, bias=False):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim)) if elementwise_affine else None
        self.bias = nn.Parameter(torch.zeros(dim)) if (elementwise_affine and bias) else None

    def forward(self, hidden_states):
        input_dtype = hidden_states.dtype
        variance = hidden_states.to(torch.float32).pow(2).mean(-1, keepdim=True)
        hidden_states = hidden_states.to(torch.float32) * torch.rsqrt(variance + self.eps)
        if self.weight is not None:
            hidden_states = hidden_states.to(self.weight.dtype) * self.weight
            if self.bias is not None:
                hidden_states = hidden_states + self.bias
        else:
            hidden_states = hidden_states.to(input_dtype)
        return hidden_states


class AdaLayerNormContinuous(nn.Module):
    def __init__(self, embedding_dim, conditioning_embedding_dim,
                 elementwise_affine=True, eps=1e-5, bias=True,
                 norm_type="layer_norm"):
        super().__init__()
        self.silu = nn.SiLU()
        self.linear = nn.Linear(conditioning_embedding_dim, embedding_dim * 2, bias=bias)
        self.norm = nn.LayerNorm(embedding_dim, eps, elementwise_affine, bias)

    def forward(self, x, conditioning_embedding):
        emb = self.linear(self.silu(conditioning_embedding).to(x.dtype))
        scale, shift = torch.chunk(emb, 2, dim=1)
        return self.norm(x) * (1 + scale)[:, None, :] + shift[:, None, :]


class AdaLayerNormZero(nn.Module):
    def __init__(self, embedding_dim, num_embeddings=None, norm_type="layer_norm",
                 bias=True):
        super().__init__()
        self.emb = None
        self.silu = nn.SiLU()
        self.linear = nn.Linear(embedding_dim, 6 * embedding_dim, bias=bias)
        self.norm = nn.LayerNorm(embedding_dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, timestep=None, class_labels=None, hidden_dtype=None, emb=None):
        emb = self.linear(self.silu(emb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = emb.chunk(6, dim=1)
        x = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return x, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormZeroSingle(nn.Module):
    def __init__(self, embedding_dim, norm_type="layer_norm", bias=True):
        super().__init__()
        self.silu = nn.SiLU()
        self.linear = nn.Linear(embedding_dim, 3 * embedding_dim, bias=bias)
        self.norm = nn.LayerNorm(embedding_dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb=None):
        emb = self.linear(self.silu(emb))
        shift_msa, scale_msa, gate_msa = emb.chunk(3, dim=1)
        x = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return x, gate_msa


# ---------------------------------------------------------------------------
# attention (diffusers.models.attention / attention_processor / attention_dispatch)


class GELU(nn.Module):
    def __init__(self, dim_in, dim_out, approximate="none", bias=True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out, bias=bias)
        self.approximate = approximate

    def forward(self, hidden_states):
        return F.gelu(self.proj(hidden_states), approximate=self.approximate)


class FeedForward(nn.Module):
    def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                 activation_fn="geglu", final_dropout=False, inner_dim=None,
                 bias=True):
        super().__init__()
        inner_dim = inner_dim or int(dim * mult)
        dim_out = dim_out or dim
        if activation_fn == "gelu-approximate":
            act = GELU(dim, inner_dim, approximate="tanh", bias=bias)
        elif activation_fn == "gelu":
            act = GELU(dim, inner_dim, bias=bias)
        else:
            raise NotImplementedError(f"stub FeedForward: {activation_fn}")
        self.net = nn.ModuleList([act, nn.Dropout(dropout),
                                  nn.Linear(inner_dim, dim_out, bias=bias)])

    def forward(self, hidden_states):
        for module in self.net:
            hidden_states = module(hidden_states)
        return hidden_states


def dispatch_attention_fn(query, key, value, attn_mask=None, dropout_p=0.0,
                          is_causal=False, backend=None, parallel_config=None):
    """[B, S, H, D] in/out (the diffusers dispatcher's native layout)."""
    q, k, v = (t.permute(0, 2, 1, 3) for t in (query, key, value))
    out = F.scaled_dot_product_attention(q, k, v, attn_mask=attn_mask,
                                         dropout_p=dropout_p, is_causal=is_causal)
    return out.permute(0, 2, 1, 3)


class Attention(nn.Module):
    """The subset of diffusers.models.attention_processor.Attention the
    vendored Qwen block constructs (transformer_qwenimage.py:394-406)."""

    def __init__(self, query_dim, cross_attention_dim=None, heads=8, dim_head=64,
                 dropout=0.0, bias=False, qk_norm=None, added_kv_proj_dim=None,
                 added_proj_bias=True, out_bias=True, eps=1e-5, out_dim=None,
                 context_pre_only=None, pre_only=False, elementwise_affine=True,
                 processor=None):
        super().__init__()
        self.inner_dim = out_dim if out_dim is not None else dim_head * heads
        self.query_dim = query_dim
        self.cross_attention_dim = cross_attention_dim or query_dim
        self.out_dim = out_dim if out_dim is not None else query_dim
        self.heads = out_dim // dim_head if out_dim is not None else heads
        self.added_kv_proj_dim = added_kv_proj_dim
        self.context_pre_only = context_pre_only
        self.pre_only = pre_only

        if qk_norm == "rms_norm":
            self.norm_q = RMSNorm(dim_head, eps=eps, elementwise_affine=elementwise_affine)
            self.norm_k = RMSNorm(dim_head, eps=eps, elementwise_affine=elementwise_affine)
        elif qk_norm is None:
            self.norm_q = self.norm_k = None
        else:
            raise NotImplementedError(f"stub Attention qk_norm: {qk_norm}")

        self.to_q = nn.Linear(query_dim, self.inner_dim, bias=bias)
        self.to_k = nn.Linear(self.cross_attention_dim, self.inner_dim, bias=bias)
        self.to_v = nn.Linear(self.cross_attention_dim, self.inner_dim, bias=bias)

        self.norm_added_q = self.norm_added_k = None
        if added_kv_proj_dim is not None:
            self.add_k_proj = nn.Linear(added_kv_proj_dim, self.inner_dim, bias=added_proj_bias)
            self.add_v_proj = nn.Linear(added_kv_proj_dim, self.inner_dim, bias=added_proj_bias)
            if context_pre_only is not None:
                self.add_q_proj = nn.Linear(added_kv_proj_dim, self.inner_dim, bias=added_proj_bias)
            if qk_norm == "rms_norm":
                self.norm_added_q = RMSNorm(dim_head, eps=eps)
                self.norm_added_k = RMSNorm(dim_head, eps=eps)

        if not pre_only:
            self.to_out = nn.ModuleList([nn.Linear(self.inner_dim, self.out_dim, bias=out_bias),
                                         nn.Dropout(dropout)])
        if added_kv_proj_dim is not None and context_pre_only is not None and not context_pre_only:
            self.to_add_out = nn.Linear(self.inner_dim, self.query_dim, bias=out_bias)

        self.processor = processor

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, **kwargs):
        params = set(inspect.signature(self.processor.__call__).parameters)
        kwargs = {k: v for k, v in kwargs.items() if k in params}
        return self.processor(self, hidden_states,
                              encoder_hidden_states=encoder_hidden_states,
                              attention_mask=attention_mask, **kwargs)


# ---------------------------------------------------------------------------
# boilerplate the vendored files touch only at import/class-definition time


class ModelMixin(nn.Module):
    _supports_gradient_checkpointing = False

    @property
    def dtype(self):
        return next(self.parameters()).dtype

    @property
    def device(self):
        return next(self.parameters()).device


class ConfigMixin:
    pass


def register_to_config(init):
    @functools.wraps(init)
    def wrapped(self, *args, **kwargs):
        init(self, *args, **kwargs)
    return wrapped


class _NoopMixin:
    pass


class AttentionMixin(_NoopMixin):
    pass


class AttentionModuleMixin:
    fused_projections = False
    _attention_backend = None
    _parallel_config = None

    def set_processor(self, processor):
        self.processor = processor


class CacheMixin(_NoopMixin):
    pass


class PeftAdapterMixin(_NoopMixin):
    pass


class FromOriginalModelMixin(_NoopMixin):
    pass


class FluxTransformer2DLoadersMixin(_NoopMixin):
    pass


class ContextParallelInput:
    def __init__(self, *a, **k):
        pass


class ContextParallelOutput:
    def __init__(self, *a, **k):
        pass


class Transformer2DModelOutput:
    def __init__(self, sample):
        self.sample = sample


def maybe_allow_in_graph(cls):
    return cls


def scale_lora_layers(model, scale):
    pass


def unscale_lora_layers(model, scale):
    pass


class _Logger:
    def warning(self, *a, **k):
        pass

    def info(self, *a, **k):
        pass

    def debug(self, *a, **k):
        pass


class _LoggingModule(types.ModuleType):
    def get_logger(self, name=None):
        return _Logger()


USE_PEFT_BACKEND = False


def install() -> None:
    """Register the fake `diffusers` package tree in sys.modules."""
    g = globals()

    def mod(name, **symbols):
        m = sys.modules.get(name)
        if m is None:
            m = types.ModuleType(name)
            sys.modules[name] = m
        for k, v in symbols.items():
            setattr(m, k, v)
        return m

    diffusers = mod("diffusers")
    mod("diffusers.configuration_utils", ConfigMixin=ConfigMixin,
        register_to_config=register_to_config)
    mod("diffusers.loaders", FluxTransformer2DLoadersMixin=FluxTransformer2DLoadersMixin,
        FromOriginalModelMixin=FromOriginalModelMixin, PeftAdapterMixin=PeftAdapterMixin)
    models = mod("diffusers.models")
    mod("diffusers.models._modeling_parallel", ContextParallelInput=ContextParallelInput,
        ContextParallelOutput=ContextParallelOutput)
    mod("diffusers.models.attention", AttentionMixin=AttentionMixin,
        AttentionModuleMixin=AttentionModuleMixin, FeedForward=FeedForward)
    mod("diffusers.models.attention_dispatch", dispatch_attention_fn=dispatch_attention_fn)
    mod("diffusers.models.attention_processor", Attention=Attention)
    mod("diffusers.models.cache_utils", CacheMixin=CacheMixin)
    mod("diffusers.models.embeddings",
        CombinedTimestepGuidanceTextProjEmbeddings=CombinedTimestepGuidanceTextProjEmbeddings,
        CombinedTimestepTextProjEmbeddings=CombinedTimestepTextProjEmbeddings,
        apply_rotary_emb=apply_rotary_emb, get_1d_rotary_pos_embed=get_1d_rotary_pos_embed,
        TimestepEmbedding=TimestepEmbedding, Timesteps=Timesteps,
        PixArtAlphaTextProjection=PixArtAlphaTextProjection)
    mod("diffusers.models.modeling_outputs", Transformer2DModelOutput=Transformer2DModelOutput)
    mod("diffusers.models.modeling_utils", ModelMixin=ModelMixin)
    mod("diffusers.models.normalization", AdaLayerNormContinuous=AdaLayerNormContinuous,
        AdaLayerNormZero=AdaLayerNormZero, AdaLayerNormZeroSingle=AdaLayerNormZeroSingle,
        RMSNorm=RMSNorm)
    logging_mod = _LoggingModule("diffusers.utils.logging")
    sys.modules["diffusers.utils.logging"] = logging_mod
    utils = mod("diffusers.utils", USE_PEFT_BACKEND=USE_PEFT_BACKEND,
                scale_lora_layers=scale_lora_layers, unscale_lora_layers=unscale_lora_layers)
    utils.logging = logging_mod
    mod("diffusers.utils.torch_utils", maybe_allow_in_graph=maybe_allow_in_graph)
    diffusers.models = models
    diffusers.utils = utils
    _ = g  # keep lint quiet
