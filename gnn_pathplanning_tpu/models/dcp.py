"""DCP: the decentralized multi-robot path-planning policy network.

Capability parity with the reference ``DecentralPlannerNet``
(/root/reference/graphs/models/decentralplanner.py:13-318, the "v1.4"
architecture at decentralplanner.py:88-98), re-designed for TPU:

- The reference loops a shared CNN over agents in Python
  (decentralplanner.py:284-290); here agents fold into the batch axis of a
  single NHWC convolution stack, so the MXU sees one large conv per layer.
- The K-hop graph filter is ``ops.graph_filter`` (features-last, one fused
  tap contraction) instead of torch ``GraphFilterBatch``.
- Logits come back as one ``[B, N, 5]`` tensor rather than a per-agent list.

Architecture (identical to the reference):
  CNN: 5x [Conv3x3 stride 1 pad SAME -> BatchNorm -> ReLU], channels
       [32, 32, 64, 64, 128], MaxPool2x2 after layers 0, 2, 4
       (11 -> 5 -> 5 -> 2 -> 2 -> 1 spatially; floor pooling = VALID window).
  compress MLP: Dense 128 -> ReLU.
  GFL: one K-tap graph filter 128 -> 128 (+bias) -> ReLU.
  action MLP: Dense 5.

Initialization matches /root/reference/graphs/weights_initializer.py:11-22
(xavier-normal conv/linear kernels, zero linear bias, N(1, 0.02) batchnorm
scale) and GraphFilterBatch.reset_parameters (uniform ±1/sqrt(G*K),
graphML.py:2442-2447). Conv biases keep the torch default
U(±1/sqrt(fan_in)) since the reference initializer leaves them untouched.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.graph_filter import graph_filter

_CNN_CHANNELS = (32, 32, 64, 64, 128)
_POOL_AFTER = (0, 2, 4)
_NUM_ACTIONS = 5


@dataclasses.dataclass(frozen=True)
class DCPConfig:
    """Hyperparameters of the DCP policy (reference configs/dcp_ECBS.json)."""
    num_taps: int = 3          # nGraphFilterTaps (K)
    features: int = 128        # compressed node feature width
    num_actions: int = _NUM_ACTIONS
    cnn: str = "v14"           # 'v14' (flagship) or 'vgg' (reference
                               # use_vgg variant, decentralplanner.py:117-153)
    dtype: jnp.dtype = jnp.float32


# Reference VGG config (decentralplanner.py:126): conv channels with 'M'
# max-pool markers; compress MLP 512 -> 4096 -> 4096 -> 128 with dropout.
_VGG_CFG = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M")


def _xavier_normal():
    return nn.initializers.xavier_normal()


def _torch_conv_bias_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def _batchnorm_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


class GraphFilterLayer(nn.Module):
    """K-tap graph filter as a flax module holding taps [K, G, F] + bias [F]."""
    features: int
    num_taps: int

    @nn.compact
    def __call__(self, x: jax.Array, s: jax.Array) -> jax.Array:
        g = x.shape[-1]
        stdv = 1.0 / ((g * self.num_taps) ** 0.5)
        uniform = nn.initializers.uniform(scale=2 * stdv)
        # uniform() samples [0, scale); shift to (-stdv, stdv) to match the
        # reference's uniform_(-stdv, stdv).
        taps = self.param("taps", lambda k, sh: uniform(k, sh) - stdv,
                          (self.num_taps, g, self.features))
        bias = self.param("bias", lambda k, sh: uniform(k, sh) - stdv,
                          (self.features,))
        return graph_filter(x, s, taps, bias)


class DCPNet(nn.Module):
    """CNN -> compress MLP -> K-hop GNN -> action MLP, over [B, N, 3, 11, 11].

    Call with ``train=True`` inside ``nn.apply`` with a ``batch_stats``
    mutable collection for batchnorm running averages (torch momentum 0.1 ==
    flax momentum 0.9).
    """
    cfg: DCPConfig = DCPConfig()

    @nn.compact
    def __call__(self, obs: jax.Array, gso: jax.Array,
                 *, train: bool = False) -> jax.Array:
        b, n = obs.shape[0], obs.shape[1]
        # [B, N, C, H, W] -> [B*N, H, W, C]  (agents fold into batch; NHWC)
        x = obs.reshape(b * n, *obs.shape[2:]).transpose(0, 2, 3, 1)
        x = x.astype(self.cfg.dtype)

        if self.cfg.cnn == "vgg":
            x = self._vgg_encoder(x, train)
        else:
            x = self._v14_encoder(x, train)
        x = x.reshape(b * n, -1)
        x = nn.Dense(self.cfg.features, kernel_init=_xavier_normal(),
                     bias_init=nn.initializers.zeros, dtype=self.cfg.dtype,
                     name="compress0")(x)
        x = nn.relu(x)

        # [B, N, F] node signals; K-hop exchange over the communication graph.
        x = x.reshape(b, n, self.cfg.features)
        x = GraphFilterLayer(self.cfg.features, self.cfg.num_taps,
                             name="gfl0")(x, gso.astype(self.cfg.dtype))
        x = nn.relu(x)

        logits = nn.Dense(self.cfg.num_actions, kernel_init=_xavier_normal(),
                          bias_init=nn.initializers.zeros,
                          dtype=self.cfg.dtype, name="actions0")(x)
        return logits  # [B, N, num_actions]

    def _v14_encoder(self, x: jax.Array, train: bool) -> jax.Array:
        """Flagship CNN (reference "v1.4", decentralplanner.py:88-98)."""
        for layer, ch in enumerate(_CNN_CHANNELS):
            x = nn.Conv(ch, (3, 3), strides=1, padding="SAME",
                        kernel_init=_xavier_normal(),
                        bias_init=_torch_conv_bias_init(9 * x.shape[-1]),
                        dtype=self.cfg.dtype, name=f"conv{layer}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, scale_init=_batchnorm_scale_init,
                             dtype=self.cfg.dtype, name=f"bn{layer}")(x)
            x = nn.relu(x)
            if layer in _POOL_AFTER:
                x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")
        return x

    def _vgg_encoder(self, x: jax.Array, train: bool) -> jax.Array:
        """Reference VGG variant (decentralplanner.py:117-126, 142-153,
        246-263 make_layers + vgg compressMLP). Deviation: pools are skipped
        once the spatial extent reaches 1x1 — the reference config applied to
        an 11x11 FOV would floor-pool to zero size (torch would error), so
        the variant was unusable there; this keeps it usable at any FOV.
        """
        layer = 0
        for spec in _VGG_CFG:
            if spec == "M":
                if x.shape[1] >= 2:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2),
                                    padding="VALID")
                continue
            x = nn.Conv(int(spec), (3, 3), strides=1, padding="SAME",
                        kernel_init=_xavier_normal(),
                        bias_init=_torch_conv_bias_init(9 * x.shape[-1]),
                        dtype=self.cfg.dtype, name=f"vgg_conv{layer}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, scale_init=_batchnorm_scale_init,
                             dtype=self.cfg.dtype, name=f"vgg_bn{layer}")(x)
            x = nn.relu(x)
            layer += 1
        # vgg compress head: 512 -> 4096 -> 4096 (dropout between) before the
        # shared compress0 Dense maps to self.cfg.features.
        b = x.shape[0]
        x = x.reshape(b, -1)
        for i, width in enumerate((4096, 4096)):
            x = nn.Dense(width, kernel_init=_xavier_normal(),
                         bias_init=nn.initializers.zeros,
                         dtype=self.cfg.dtype, name=f"vgg_fc{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(0.5, deterministic=not train)(x)
        return x

    def init_variables(self, key: jax.Array, num_agents: int):
        """Convenience: init params/batch_stats for N agents."""
        obs = jnp.zeros((1, num_agents, 3, 11, 11), self.cfg.dtype)
        gso = jnp.zeros((1, num_agents, num_agents), self.cfg.dtype)
        return self.init(key, obs, gso, train=False)
