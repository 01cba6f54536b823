"""Extended graph-signal-processing operator library.

Capability parity with the reference's vendored GSP library
(/root/reference/utils/graphUtils/graphML.py) beyond the core batched K-tap
filter (ops.graph_filter). The reference ships these as torch modules —
``spectralGF`` (:143), ``NVGF`` node-variant (:258), ``EVGF`` edge-variant
(:354), ``learnAttentionGSO``/``graphAttention`` (:455,554), local
activations (:626,775), local max pooling (:971), and the RNN filter
variants (:2491+). Here they are pure functions in the TPU-native
features-last layout ``[B, N, G]``; flax modules wrap them in
models.gnn_layers.

Conventions: ``s`` is ``[B, N, N]`` (or ``[N, N]`` shared), contraction
``z[b,n,g] = sum_m s[b,m,n] x[b,m,g]`` matching ops.graph_filter.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _shift(s: jax.Array, x: jax.Array) -> jax.Array:
    """One graph shift: [B,N,N] x [B,N,G] -> [B,N,G]."""
    return jnp.einsum("bmn,bmg->bng", s, x)


# ------------------------------------------------------------- spectral
def spectral_gf(coeffs: jax.Array, eigvecs: jax.Array, x: jax.Array,
                bias: jax.Array | None = None) -> jax.Array:
    """Spectral graph filter (reference spectralGF, graphML.py:143-257).

    Args:
      coeffs: [N, G, F] — learned filter response per eigenvalue index,
        input feature, and output feature.
      eigvecs: [N, N] GFT basis V (columns are eigenvectors of the GSO).
      x: [B, N, G].

    y = V diag-mix (V^T x): x_hat = V^T x; y_hat[n, f] = sum_g
    coeffs[n, g, f] * x_hat[n, g]; y = V y_hat.
    """
    x_hat = jnp.einsum("nm,bng->bmg", eigvecs, x)      # V^T x (freq domain)
    y_hat = jnp.einsum("bng,ngf->bnf", x_hat, coeffs)
    y = jnp.einsum("mn,bnf->bmf", eigvecs, y_hat)
    if bias is not None:
        y = y + bias
    return y


# ---------------------------------------------------------- node-variant
def node_variant_gf(taps: jax.Array, s: jax.Array, x: jax.Array,
                    bias: jax.Array | None = None) -> jax.Array:
    """Node-variant graph filter (reference NVGF, graphML.py:258-353).

    Every node applies its own tap weights: taps [K, N, G, F];
    y = sum_k diag-per-node(taps_k) applied to S^k-shifted signals.
    """
    k_taps = taps.shape[0]
    z = x
    y = jnp.einsum("bng,ngf->bnf", z, taps[0])
    for k in range(1, k_taps):
        z = _shift(s, z)
        y = y + jnp.einsum("bng,ngf->bnf", z, taps[k])
    if bias is not None:
        y = y + bias
    return y


# ---------------------------------------------------------- edge-variant
def edge_variant_gf(phi: jax.Array, support: jax.Array, x: jax.Array,
                    weights: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """Edge-variant graph filter (reference EVGF, graphML.py:354-454).

    Each tap k has its own learnable shift matrix Phi_k restricted to the
    graph support (plus the diagonal): z_k = (Phi_k * support)^T z_{k-1}.

    Args:
      phi: [K-1, N, N] learnable edge weights (tap 0 is the identity).
      support: [N, N] 0/1 mask (adjacency + self-loops).
      x: [B, N, G]; weights: [K, G, F] per-tap feature mixing.
    """
    k_taps = weights.shape[0]
    z = x
    y = jnp.einsum("bng,gf->bnf", z, weights[0])
    for k in range(1, k_taps):
        sk = phi[k - 1] * support
        z = jnp.einsum("mn,bmg->bng", sk, z)
        y = y + jnp.einsum("bng,gf->bnf", z, weights[k])
    if bias is not None:
        y = y + bias
    return y


# ------------------------------------------------------------- attention
def graph_attention(x: jax.Array, s: jax.Array, w: jax.Array,
                    a_src: jax.Array, a_dst: jax.Array,
                    negative_slope: float = 0.2) -> jax.Array:
    """Multi-head graph attention (reference learnAttentionGSO/graphAttention,
    graphML.py:455-625 — the GAT mechanism over the communication graph).

    Args:
      x: [B, N, G]; s: [B, N, N] adjacency (only sparsity pattern used).
      w: [H, G, F] per-head projection; a_src/a_dst: [H, F] attention vectors
        (the concatenated GAT attention split into source/destination parts).

    Returns [B, N, H*F] (heads concatenated).
    """
    proj = jnp.einsum("bng,hgf->bhnf", x, w)
    e_src = jnp.einsum("bhnf,hf->bhn", proj, a_src)
    e_dst = jnp.einsum("bhnf,hf->bhn", proj, a_dst)
    scores = e_src[:, :, :, None] + e_dst[:, :, None, :]   # [B,H,N,N] (m->n)
    scores = jax.nn.leaky_relu(scores, negative_slope)
    mask = (s > 0)[:, None, :, :]
    # include self-loops, standard GAT practice and reference behavior
    eye = jnp.eye(s.shape[-1], dtype=bool)[None, None]
    mask = mask | eye
    scores = jnp.where(mask, scores, -jnp.inf)
    att = jax.nn.softmax(scores, axis=2)                    # over senders m
    out = jnp.einsum("bhmn,bhmf->bhnf", att, proj)
    b, h, n, f = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, n, h * f)


# ------------------------------------------------ local activations/pool
def neighborhood_mask(s: jax.Array, hops: int) -> jax.Array:
    """[B, N, N] bool: m in k-hop neighborhood of n (including self)."""
    n = s.shape[-1]
    adj = (s != 0).astype(jnp.float32)
    reach = jnp.eye(n)[None].repeat(s.shape[0], 0)
    acc = reach
    for _ in range(hops):
        reach = jnp.minimum(jnp.einsum("bmk,bkn->bmn", adj, reach), 1.0)
        acc = jnp.minimum(acc + reach, 1.0)
    return acc > 0


def max_local_activation(x: jax.Array, s: jax.Array, hops: int = 1) -> jax.Array:
    """Max over each node's k-hop neighborhood per feature
    (reference MaxLocalActivation, graphML.py:626-774)."""
    mask = neighborhood_mask(s, hops)                       # [B, N, N]
    expanded = jnp.where(mask[:, :, :, None], x[:, :, None, :], -jnp.inf)
    return jnp.max(expanded, axis=1)                        # reduce senders


def median_local_activation(x: jax.Array, s: jax.Array, hops: int = 1) -> jax.Array:
    """Median over each node's k-hop neighborhood (reference
    MedianLocalActivation, graphML.py:775-902). Masked median: out-of-
    neighborhood entries are pushed to +/-inf symmetrically and a masked
    sort-based median over valid counts is taken."""
    mask = neighborhood_mask(s, hops)                       # [B, N(m), N(n)]
    b, n = x.shape[0], x.shape[1]
    g = x.shape[2]
    vals = jnp.where(mask[:, :, :, None], x[:, :, None, :], jnp.inf)
    vals = jnp.sort(vals, axis=1)                           # valid first
    count = jnp.sum(mask, axis=1)                           # [B, N]
    lo = ((count - 1) // 2)[:, None, :, None]
    hi = (count // 2)[:, None, :, None]
    take = lambda idx: jnp.take_along_axis(
        vals, jnp.broadcast_to(idx, (b, 1, n, g)), axis=1)[:, 0]
    return 0.5 * (take(lo) + take(hi))


def max_pool_local(x: jax.Array, s: jax.Array, keep: jax.Array,
                   hops: int = 1) -> jax.Array:
    """Local max pooling then node selection (reference MaxPoolLocal,
    graphML.py:971-1110): each kept node takes the max over its k-hop
    neighborhood; ``keep`` is an int array of node indices to retain."""
    pooled = max_local_activation(x, s, hops)
    return pooled[:, keep, :]


# ----------------------------------------------------------------- RNN
def graph_filter_rnn(weights_in: jax.Array, weights_hid: jax.Array,
                     s_seq: jax.Array, x_seq: jax.Array, h0: jax.Array,
                     bias: jax.Array | None = None,
                     nonlinearity=jax.nn.tanh) -> jax.Array:
    """Graph-filter RNN (reference GraphFilterRNNBatch, graphML.py:2491+):
    h_t = sigma( A(S_t) x_t + B(S_t) h_{t-1} ), both A and B K-tap filters.

    Args:
      weights_in: [K, G, H]; weights_hid: [K, H, H];
      s_seq: [T, B, N, N]; x_seq: [T, B, N, G]; h0: [B, N, H].

    Returns the hidden-state sequence [T, B, N, H].
    """
    from .graph_filter import graph_filter

    def step(h, inputs):
        s_t, x_t = inputs
        h_new = graph_filter(x_t, s_t, weights_in, bias) + \
            graph_filter(h, s_t, weights_hid)
        h_new = nonlinearity(h_new)
        return h_new, h_new

    _, hs = jax.lax.scan(step, h0, (s_seq, x_seq))
    return hs
