"""Multi-scale hypergraph time-series model (MSHyper rebuild).

The reference ships a hypergraph-conv forecaster that cannot run: it
imports `.Layers`/`.embed` modules that don't exist and needs
torch_geometric/torch_scatter (reference models/MSHyper.py:14-17,
SURVEY.md §8.7). This is the working TPU-native rebuild of its technique:

- instance normalization of the input window (MSHyper.py:69-73),
- a multi-scale pyramid: the sequence is repeatedly downsampled by conv
  'bottlenecks' (the reference's Bottleneck_Construct CSCM), and all scales'
  nodes are concatenated,
- hyperedges connect (a) sliding windows of `inner_size` nodes within each
  scale and (b) each coarse node with its children one scale down —
  the reference's get_mask pyramid graph (MSHyper.py:52),
- two-pass hypergraph convolution with degree normalization: node->edge
  aggregation scaled by 1/edge-degree, edge->node by 1/node-degree
  (HypergraphConv.__forward__, MSHyper.py:480-495), with optional
  hyperedge attention (softmax over the edges incident to each node),
- a DLinear-style trunk (Linear seq->pred per channel) summed with the
  hypergraph branch, then an output mixing layer (MSHyper.py:100-120).

TPU-first: the incidence structure is a DENSE (N, E) matrix built once at
trace time, so both message-passing passes are plain matmuls on the MXU —
no scatter/gather, no torch_geometric.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def build_pyramid_sizes(seq_len: int, window_sizes: Sequence[int]) -> list[int]:
    """Node count per scale: seq_len, then repeated integer division."""
    sizes = [seq_len]
    for w in window_sizes:
        sizes.append(max(1, sizes[-1] // w))
    return sizes


def build_pyramid_incidence(seq_len: int, window_sizes: Sequence[int],
                            inner_size: int = 3) -> np.ndarray:
    """Dense incidence matrix H (N_total, E): H[n, e] = 1 iff node n is in
    hyperedge e. Intra-scale sliding-window edges + inter-scale parent-child
    edges (the reference's get_mask graph)."""
    sizes = build_pyramid_sizes(seq_len, window_sizes)
    offsets = np.cumsum([0] + sizes)
    n_total = offsets[-1]

    edges = []
    # intra-scale: window of `inner_size` consecutive nodes, stride 1
    for s, size in enumerate(sizes):
        base = offsets[s]
        for start in range(max(1, size - inner_size + 1)):
            nodes = [base + start + k for k in range(min(inner_size, size))]
            edges.append(nodes)
    # inter-scale: each coarse node + its `w` children
    for s, w in enumerate(window_sizes):
        fine_base, coarse_base = offsets[s], offsets[s + 1]
        for c in range(sizes[s + 1]):
            children = [fine_base + c * w + k for k in range(w)
                        if c * w + k < sizes[s]]
            edges.append([coarse_base + c] + children)

    H = np.zeros((n_total, len(edges)), np.float32)
    for e, nodes in enumerate(edges):
        H[nodes, e] = 1.0
    return H


def hypergraph_conv(x, H, attention_scores=None):
    """Two-pass degree-normalized hypergraph convolution.

    x: (B, N, F) node features; H: (N, E) incidence.
    edge_feat = diag(1/edge_deg) H^T x        (node -> hyperedge)
    out       = diag(1/node_deg) H edge_feat  (hyperedge -> node)
    Optional attention_scores (B, N, E) reweight the second pass.
    Both passes are dense matmuls (MXU).
    """
    H = H.astype(x.dtype)
    edge_deg = jnp.clip(H.sum(axis=0), 1.0)   # (E,)
    node_deg = jnp.clip(H.sum(axis=1), 1.0)   # (N,)

    edge_feat = jnp.einsum("ne,bnf->bef", H, x) / edge_deg[None, :, None]
    Hw = H[None] if attention_scores is None else H[None] * attention_scores
    out = jnp.einsum("bne,bef->bnf", Hw, edge_feat) / node_deg[None, :, None]
    return out


class HyperedgeAttention(nn.Module):
    """Per-node softmax attention over incident hyperedges
    (the reference's W_query/W_key hyperedge attention,
    MSHyper.py:446-448)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, H):
        q = nn.Dense(self.features, dtype=self.dtype)(x)     # (B, N, F)
        edge_deg = jnp.clip(H.sum(axis=0), 1.0)
        edge_feat = jnp.einsum("ne,bnf->bef", H.astype(x.dtype), x)
        edge_feat = edge_feat / edge_deg[None, :, None]
        k = nn.Dense(self.features, dtype=self.dtype)(edge_feat)  # (B, E, F)
        scores = jnp.einsum("bnf,bef->bne", q, k) / jnp.sqrt(float(self.features))
        scores = jnp.where(H[None] > 0, scores, -1e9)
        return nn.softmax(scores, axis=-1)


class PyramidConstruct(nn.Module):
    """Bottleneck_Construct parity: produce coarser scales by strided 1-D
    convs and concatenate all scales' nodes."""

    d_model: int
    window_sizes: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (B, L, C)
        x = nn.Dense(self.d_model, dtype=self.dtype)(x)
        scales = [x]
        cur = x
        for w in self.window_sizes:
            cur = nn.Conv(self.d_model, kernel_size=(w,), strides=(w,),
                          padding="VALID", dtype=self.dtype)(cur)
            scales.append(cur)
        return jnp.concatenate(scales, axis=1)  # (B, N_total, d_model)


class MSHyperModel(nn.Module):
    """Forecaster: x (B, seq_len, channels) -> (B, pred_len, channels)."""

    seq_len: int
    pred_len: int
    channels: int
    d_model: int = 64
    window_sizes: Sequence[int] = (4, 4)
    inner_size: int = 3
    use_attention: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # instance normalization (MSHyper.py:69-73); de-norm at the end
        mean = jnp.mean(x, axis=1, keepdims=True)
        std = jnp.sqrt(jnp.var(x, axis=1, keepdims=True) + 1e-5)
        xn = (x - mean) / std

        H = jnp.asarray(build_pyramid_incidence(
            self.seq_len, self.window_sizes, self.inner_size))

        nodes = PyramidConstruct(self.d_model, self.window_sizes,
                                 dtype=self.dtype)(xn)
        attn = (HyperedgeAttention(self.d_model, dtype=self.dtype)(nodes, H)
                if self.use_attention else None)
        conv = hypergraph_conv(nodes, H, attn)
        conv = nn.relu(conv + nodes)  # residual

        # hypergraph branch -> (B, pred_len, C)
        g = nn.Dense(self.channels, dtype=self.dtype)(conv)  # (B, N, C)
        g = jnp.swapaxes(g, 1, 2)                            # (B, C, N)
        g = nn.Dense(self.pred_len, dtype=self.dtype, name="out_tran")(g)

        # DLinear trunk: Linear(seq -> pred) on each channel (MSHyper.py:47)
        t = jnp.swapaxes(xn, 1, 2)                           # (B, C, L)
        t = nn.Dense(self.pred_len, dtype=self.dtype, name="trunk")(t)

        y = t + g
        y = nn.Dense(self.pred_len, dtype=self.dtype, name="mix")(y)
        y = jnp.swapaxes(y, 1, 2)                            # (B, pred, C)
        return y * std + mean
