"""Flax layers over the extended GNN operator library.

Module counterparts of /root/reference/utils/graphUtils/graphML.py's layer
zoo (GraphFilter :1111, SpectralGF :1378, NodeVariantGF :1538, EdgeVariantGF
:1732, GraphAttentional :1932, GraphFilterRNN :1233/2491), in features-last
layout over ``ops.graph_lib``. Initializations follow the reference's
``reset_parameters`` uniform(±1/sqrt(fan)) conventions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import graph_lib
from ..ops.graph_filter import graph_filter


def _uniform_pm(stdv: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -stdv, stdv)
    return init


class GraphFilter(nn.Module):
    """Shared-GSO K-tap filter (graphML.py:1111 GraphFilter): same math as
    models.dcp.GraphFilterLayer but callable with an [N,N] GSO broadcast
    over the batch."""
    features: int
    num_taps: int

    @nn.compact
    def __call__(self, x, s):
        g = x.shape[-1]
        stdv = 1.0 / ((g * self.num_taps) ** 0.5)
        taps = self.param("taps", _uniform_pm(stdv),
                          (self.num_taps, g, self.features))
        bias = self.param("bias", _uniform_pm(stdv), (self.features,))
        if s.ndim == 2:
            s = jnp.broadcast_to(s, (x.shape[0],) + s.shape)
        return graph_filter(x, s, taps, bias)


class SpectralGraphFilter(nn.Module):
    """Spectral filter over a fixed GFT basis (graphML.py:1378 SpectralGF)."""
    features: int

    @nn.compact
    def __call__(self, x, eigvecs):
        n, g = x.shape[1], x.shape[2]
        stdv = 1.0 / (g ** 0.5)
        coeffs = self.param("coeffs", _uniform_pm(stdv),
                            (n, g, self.features))
        bias = self.param("bias", _uniform_pm(stdv), (self.features,))
        return graph_lib.spectral_gf(coeffs, eigvecs, x, bias)


class NodeVariantGraphFilter(nn.Module):
    """Per-node tap weights (graphML.py:1538 NodeVariantGF)."""
    features: int
    num_taps: int

    @nn.compact
    def __call__(self, x, s):
        n, g = x.shape[1], x.shape[2]
        stdv = 1.0 / ((g * self.num_taps) ** 0.5)
        taps = self.param("taps", _uniform_pm(stdv),
                          (self.num_taps, n, g, self.features))
        bias = self.param("bias", _uniform_pm(stdv), (self.features,))
        return graph_lib.node_variant_gf(taps, s, x, bias)


class EdgeVariantGraphFilter(nn.Module):
    """Learnable per-edge shift weights on the graph support
    (graphML.py:1732 EdgeVariantGF)."""
    features: int
    num_taps: int

    @nn.compact
    def __call__(self, x, support):
        n, g = x.shape[1], x.shape[2]
        stdv = 1.0 / ((g * self.num_taps) ** 0.5)
        phi = self.param("phi", _uniform_pm(stdv),
                         (self.num_taps - 1, n, n))
        weights = self.param("weights", _uniform_pm(stdv),
                             (self.num_taps, g, self.features))
        bias = self.param("bias", _uniform_pm(stdv), (self.features,))
        support = support + jnp.eye(n)  # self-loops always in support
        return graph_lib.edge_variant_gf(phi, jnp.minimum(support, 1.0), x,
                                         weights, bias)


class GraphAttention(nn.Module):
    """Multi-head GAT over the communication graph (graphML.py:1932
    GraphAttentional)."""
    features: int      # per head
    heads: int = 1
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x, s):
        g = x.shape[-1]
        stdv = 1.0 / (g ** 0.5)
        w = self.param("w", _uniform_pm(stdv),
                       (self.heads, g, self.features))
        a_src = self.param("a_src", _uniform_pm(stdv),
                           (self.heads, self.features))
        a_dst = self.param("a_dst", _uniform_pm(stdv),
                           (self.heads, self.features))
        return graph_lib.graph_attention(x, s, w, a_src, a_dst,
                                         self.negative_slope)


class GraphFilterRNN(nn.Module):
    """Recurrent graph filter over a GSO/signal sequence
    (graphML.py:1233/2491 GraphFilterRNN[Batch])."""
    hidden: int
    num_taps: int

    @nn.compact
    def __call__(self, x_seq, s_seq, h0=None):
        # x_seq [T, B, N, G]; s_seq [T, B, N, N]
        g = x_seq.shape[-1]
        stdv = 1.0 / ((g * self.num_taps) ** 0.5)
        w_in = self.param("w_in", _uniform_pm(stdv),
                          (self.num_taps, g, self.hidden))
        w_hid = self.param("w_hid", _uniform_pm(stdv),
                           (self.num_taps, self.hidden, self.hidden))
        bias = self.param("bias", _uniform_pm(stdv), (self.hidden,))
        if h0 is None:
            h0 = jnp.zeros(x_seq.shape[1:3] + (self.hidden,), x_seq.dtype)
        return graph_lib.graph_filter_rnn(w_in, w_hid, s_seq, x_seq, h0, bias)
