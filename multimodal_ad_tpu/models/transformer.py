"""Cross-modal transformer toolkit + small 3D CNN tokenizers.

Productizes the reference's unused-but-intended fusion model
(reference models/network.py:18-281 — SURVEY.md §2.2 notes no entry point
imports it; this framework wires it into MultimodalClassifier below):

- SmallCNN3D — `sNet` parity (network.py:18-61): 4 conv stages, /16 spatial,
- SFCN — network.py:64-110 (sans its debug prints),
- Attention with optional cross-attention context and kv_include_self
  (network.py:141-175),
- sinusoidal PositionalEncoding1D (network.py:178-211),
- Transformer — pre-LN depth-stack (network.py:215-230),
- CrossTransformer — token cross-attention between modalities
  (network.py:233-252; the reference's share=True branch crashes on its own
  forward unpacking, SURVEY.md §8.8 — implemented correctly here),
- CrossTransformerModAvg — cross-attn + GAP/GMP cls-token concat
  (network.py:255-281),
- MultimodalClassifier — end-to-end fusion: volume tokenizers (+ optional
  tabular embedding token) -> cross-transformer -> classifier head. This is
  the productization BASELINE.json's config 5 asks for.

TPU-first: tokens are (B, T, D) with D a multiple of 128 recommended;
attention is plain batched matmul (short sequences — no flash/ring needed,
SURVEY.md §5 long-context note).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class ConvBNAct(nn.Module):
    features: int
    kernel: int = 3
    act: str = "leaky_relu"
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.Conv(self.features, (self.kernel,) * 3,
                    padding=(self.kernel - 1) // 2, **kw)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(x)
        return nn.leaky_relu(x) if self.act == "leaky_relu" else nn.relu(x)


def _maxpool2(x):
    return nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))


def _avgpool2(x):
    return nn.avg_pool(x, (2, 2, 2), strides=(2, 2, 2))


class SmallCNN3D(nn.Module):
    """sNet parity: stages dim/4 -> dim/4,dim/2 -> dim/2,dim -> 2dim,dim
    with max/max/max/avg pooling (network.py:18-61). Output (B, X/16, Y/16,
    Z/16, dim)."""

    dim: int = 128
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d = self.dim
        x = x.astype(self.dtype)
        x = _maxpool2(ConvBNAct(d // 4, **kw)(x, train))
        x = ConvBNAct(d // 4, **kw)(x, train)
        x = _maxpool2(ConvBNAct(d // 2, **kw)(x, train))
        x = ConvBNAct(d // 2, **kw)(x, train)
        x = _maxpool2(ConvBNAct(d, **kw)(x, train))
        x = ConvBNAct(d * 2, **kw)(x, train)
        x = _avgpool2(ConvBNAct(d, kernel=1, **kw)(x, train))
        return x


class SFCN(nn.Module):
    """SFCN parity (network.py:64-110): 32/64/128/128 pooled stages + 1x1
    head to 64 channels."""

    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        for feat in (32, 64, 128, 128):
            x = _maxpool2(ConvBNAct(feat, act="relu", **kw)(x, train))
        x = ConvBNAct(64, kernel=1, act="relu", **kw)(x, train)
        return x


class CrossAttention(nn.Module):
    """Multi-head attention with external context (network.py:141-175)."""

    dim: int
    heads: int = 4
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, kv_include_self: bool = False,
                 deterministic: bool = True):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        if kv_include_self:
            ctx = jnp.concatenate([x, ctx], axis=1)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype,
                      name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhid,bhjd->bhij", q, k) * (self.dim_head ** -0.5)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class FeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.dim, dtype=self.dtype)(x)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)


def positional_encoding_1d(n: int, channels: int) -> np.ndarray:
    """Sin/cos 1-D positional encoding (network.py:178-211)."""
    ch = int(np.ceil(channels / 2) * 2)
    inv_freq = 1.0 / (10000 ** (np.arange(0, ch, 2) / ch))
    pos = np.arange(n)[:, None] * inv_freq[None, :]
    emb = np.concatenate([np.sin(pos), np.cos(pos)], axis=-1)
    return emb[:, :channels].astype(np.float32)


class Transformer(nn.Module):
    """Pre-LN encoder stack with optional cross-attention context
    (network.py:215-230)."""

    dim: int
    depth: int
    heads: int = 4
    dim_head: int = 64
    mlp_dim: int = 256
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        for _ in range(self.depth):
            y = nn.LayerNorm(dtype=self.dtype)(x)
            x = x + CrossAttention(self.dim, self.heads, self.dim_head,
                                   self.dropout, dtype=self.dtype)(
                y, context=context, deterministic=deterministic)
            y = nn.LayerNorm(dtype=self.dtype)(x)
            x = x + FeedForward(self.dim, self.mlp_dim, self.dropout,
                                dtype=self.dtype)(y, deterministic)
        return nn.LayerNorm(dtype=self.dtype)(x)


class CrossTransformer(nn.Module):
    """Bidirectional token cross-attention (network.py:233-252): each
    modality's encoder attends to the concatenation of both token sets.
    `share=True` reuses one encoder pair across depth (fixing the
    reference's broken share branch)."""

    dim: int
    depth: int
    heads: int = 4
    dim_head: int = 64
    mlp_dim: int = 256
    dropout: float = 0.0
    share: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mri_tokens, pet_tokens, deterministic: bool = True):
        n_pairs = 1 if self.share else self.depth
        pairs = [
            (Transformer(self.dim, 1, self.heads, self.dim_head, self.mlp_dim,
                         self.dropout, dtype=self.dtype, name=f"mri_enc{i}"),
             Transformer(self.dim, 1, self.heads, self.dim_head, self.mlp_dim,
                         self.dropout, dtype=self.dtype, name=f"pet_enc{i}"))
            for i in range(n_pairs)
        ]
        for step in range(self.depth):
            mri_enc, pet_enc = pairs[0 if self.share else step]
            both = jnp.concatenate([mri_tokens, pet_tokens], axis=1)
            mri_tokens = mri_enc(mri_tokens, context=both,
                                 deterministic=deterministic) + mri_tokens
            both = jnp.concatenate([mri_tokens, pet_tokens], axis=1)
            pet_tokens = pet_enc(pet_tokens, context=both,
                                 deterministic=deterministic) + pet_tokens
        return mri_tokens, pet_tokens


class CrossTransformerModAvg(nn.Module):
    """Cross-attention (each modality attends to the other) + GAP/GMP
    pooled cls concat -> (B, 4*dim) (network.py:255-281)."""

    dim: int
    depth: int
    heads: int = 4
    dim_head: int = 64
    mlp_dim: int = 256
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mri_tokens, pet_tokens, deterministic: bool = True):
        for i in range(self.depth):
            mri_enc = Transformer(self.dim, 1, self.heads, self.dim_head,
                                  self.mlp_dim, self.dropout,
                                  dtype=self.dtype, name=f"mri_enc{i}")
            pet_enc = Transformer(self.dim, 1, self.heads, self.dim_head,
                                  self.mlp_dim, self.dropout,
                                  dtype=self.dtype, name=f"pet_enc{i}")
            mri_tokens = mri_enc(mri_tokens, context=pet_tokens,
                                 deterministic=deterministic) + mri_tokens
            pet_tokens = pet_enc(pet_tokens, context=mri_tokens,
                                 deterministic=deterministic) + pet_tokens
        cls = jnp.concatenate([
            mri_tokens.mean(axis=1), pet_tokens.mean(axis=1),
            mri_tokens.max(axis=1), pet_tokens.max(axis=1),
        ], axis=-1)
        return cls


def volume_to_tokens(feat_map, add_pos: bool = True):
    """(B, X, Y, Z, C) feature map -> (B, X*Y*Z, C) token sequence with
    sinusoidal positions."""
    b, x, y, z, c = feat_map.shape
    tokens = feat_map.reshape(b, x * y * z, c)
    if add_pos:
        pos = jnp.asarray(positional_encoding_1d(x * y * z, c))
        tokens = tokens + pos[None].astype(tokens.dtype)
    return tokens


class MultimodalClassifier(nn.Module):
    """End-to-end fusion classifier.

    Modalities: 'image' (MRI, required), optional 'pet', optional 'table'
    (a precomputed tabular embedding vector — e.g. ICLClassifier
    get_embeddings output). Volume branches tokenize via SmallCNN3D;
    tabular embeds to one token. Fusion: CrossTransformerModAvg for two
    volume modalities, plain Transformer over the token union otherwise.
    """

    num_classes: int = 2
    dim: int = 128
    depth: int = 2
    heads: int = 4
    dim_head: int = 32
    mlp_dim: int = 256
    dropout: float = 0.1
    use_pet: bool = False
    use_table: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, pet=None, table=None, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        det = not train
        mri_map = SmallCNN3D(self.dim, **kw)(image, train)
        mri_tokens = volume_to_tokens(mri_map).astype(jnp.float32)

        extra_tokens = []
        if self.use_table:
            if table is None:
                raise ValueError("use_table=True requires `table`")
            tab_tok = nn.Dense(self.dim, name="table_proj")(
                table.astype(jnp.float32))
            extra_tokens.append(tab_tok[:, None, :])

        if self.use_pet:
            if pet is None:
                raise ValueError("use_pet=True requires `pet`")
            pet_map = SmallCNN3D(self.dim, name="pet_cnn", **kw)(pet, train)
            pet_tokens = volume_to_tokens(pet_map).astype(jnp.float32)
            if extra_tokens:
                pet_tokens = jnp.concatenate([pet_tokens] + extra_tokens, axis=1)
            cls = CrossTransformerModAvg(
                self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim,
                self.dropout)(mri_tokens, pet_tokens, deterministic=det)
        else:
            tokens = jnp.concatenate([mri_tokens] + extra_tokens, axis=1)
            enc = Transformer(self.dim, self.depth, self.heads, self.dim_head,
                              self.mlp_dim, self.dropout)(
                tokens, deterministic=det)
            cls = jnp.concatenate([enc.mean(axis=1), enc.max(axis=1)], axis=-1)

        cls = nn.Dropout(self.dropout, deterministic=det)(cls)
        out = nn.Dense(self.num_classes, name="head")(cls)
        return out.astype(jnp.float32)
