"""Numerical parity of DCPNet vs a torch oracle of the reference architecture.

Builds the reference "v1.4" DecentralPlannerNet topology in torch (fresh,
from the architecture spec), randomly initializes it, imports its state_dict
into our flax DCPNet via params_from_torch_state_dict, and asserts the logits
agree on random inputs — the per-layer-allclose gate from BASELINE.md.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from gnn_pathplanning_tpu.models import DCPNet, DCPConfig, params_from_torch_state_dict  # noqa: E402


class TorchOracle(tnn.Module):
    """Reference DCP v1.4 topology: 5 conv(3x3,s1,p1)+BN+ReLU blocks with
    MaxPool2d(2) after blocks 0/2/4, Dense 128, K-tap graph filter, Dense 5."""

    def __init__(self, k_taps=3, feat=128):
        super().__init__()
        chans = [3, 32, 32, 64, 64, 128]
        layers = []
        for i in range(5):
            layers.append(tnn.Conv2d(chans[i], chans[i + 1], 3, 1, 1))
            layers.append(tnn.BatchNorm2d(chans[i + 1]))
            layers.append(tnn.ReLU())
            if i % 2 == 0:
                layers.append(tnn.MaxPool2d(2))
        self.ConvLayers = tnn.Sequential(*layers)
        self.compressMLP = tnn.Sequential(tnn.Linear(128, feat), tnn.ReLU())
        self.GFL = tnn.Sequential()  # emulate name "GFL.0.*" via ParameterDict
        self.gfl_weight = tnn.Parameter(torch.randn(feat, 1, k_taps, feat) * 0.05)
        self.gfl_bias = tnn.Parameter(torch.randn(feat, 1) * 0.05)
        self.actionsMLP = tnn.Sequential(tnn.Linear(feat, 5))
        self.k = k_taps
        self.feat = feat

    def forward(self, obs, gso):
        # obs: [B, N, 3, 11, 11]; gso: [B, N, N]
        b, n = obs.shape[:2]
        feats = []
        for a in range(n):  # reference loops agents through the shared CNN
            f = self.ConvLayers(obs[:, a])
            f = self.compressMLP(f.reshape(b, -1))
            feats.append(f)
        x = torch.stack(feats, dim=2)  # B x G x N

        # BatchLSIGF: z accumulates x S^k; y = [B,N,EKG] @ [EKG,F]
        s = gso.unsqueeze(1)  # B x 1 x N x N
        xk = x.reshape(b, 1, self.feat, n)
        zs = [xk]
        for _ in range(1, self.k):
            xk = torch.matmul(xk, s)
            zs.append(xk)
        z = torch.stack(zs, dim=2)  # B x 1 x K x G x N
        y = torch.matmul(z.permute(0, 4, 1, 2, 3).reshape(b, n, -1),
                         self.gfl_weight.reshape(self.feat, -1).T)
        y = y.permute(0, 2, 1) + self.gfl_bias  # B x F x N
        y = torch.relu(y)

        out = []
        for a in range(n):
            out.append(self.actionsMLP(y[:, :, a]))
        return torch.stack(out, dim=1)  # B x N x 5


def _state_dict_with_reference_names(m: TorchOracle):
    sd = dict(m.state_dict())
    sd["GFL.0.weight"] = sd.pop("gfl_weight")
    sd["GFL.0.bias"] = sd.pop("gfl_bias")
    return sd


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(1337)
    m = TorchOracle()
    # Perturb running stats so eval-mode BN is a real test, not identity.
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
    m.eval()
    return m


def test_eval_logits_match(oracle, rng):
    b, n = 4, 10
    obs = rng.rand(b, n, 3, 11, 11).astype(np.float32)
    # a plausible normalized GSO
    w = (rng.rand(b, n, n) < 0.4).astype(np.float32)
    w = np.triu(w, 1) + np.triu(w, 1).transpose(0, 2, 1)
    deg = w.sum(-1, keepdims=True)
    s = np.where(deg > 0, w / np.maximum(np.sqrt(deg * deg.transpose(0, 2, 1)), 1e-9), 0.0)

    with torch.no_grad():
        want = oracle(torch.from_numpy(obs), torch.from_numpy(s)).numpy()

    variables = params_from_torch_state_dict(_state_dict_with_reference_names(oracle))
    model = DCPNet(DCPConfig(num_taps=3))
    got = np.asarray(model.apply(variables, jnp.array(obs), jnp.array(s), train=False))

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_action_choice_matches(oracle, rng):
    """Argmax action parity — what the simulator actually consumes."""
    b, n = 8, 10
    obs = (rng.rand(b, n, 3, 11, 11) < 0.2).astype(np.float32)
    s = np.tile(np.eye(n, dtype=np.float32) * 0.0, (b, 1, 1))
    with torch.no_grad():
        want = oracle(torch.from_numpy(obs), torch.from_numpy(s)).numpy().argmax(-1)
    variables = params_from_torch_state_dict(_state_dict_with_reference_names(oracle))
    got = np.asarray(DCPNet().apply(variables, jnp.array(obs), jnp.array(s))).argmax(-1)
    np.testing.assert_array_equal(got, want)


def test_init_shapes():
    import jax
    model = DCPNet(DCPConfig(num_taps=3))
    variables = model.init_variables(jax.random.PRNGKey(0), num_agents=10)
    p = variables["params"]
    assert p["gfl0"]["taps"].shape == (3, 128, 128)
    assert p["conv0"]["kernel"].shape == (3, 3, 3, 32)
    assert p["actions0"]["kernel"].shape == (128, 5)
    out = model.apply(variables, jnp.zeros((2, 10, 3, 11, 11)),
                      jnp.zeros((2, 10, 10)))
    assert out.shape == (2, 10, 5)


def test_vgg_variant_builds_and_runs():
    import jax
    from gnn_pathplanning_tpu.models import DCPNet, DCPConfig
    model = DCPNet(DCPConfig(num_taps=2, cnn="vgg"))
    variables = model.init_variables(jax.random.PRNGKey(0), num_agents=4)
    out = model.apply(variables, jnp.zeros((2, 4, 3, 11, 11)),
                      jnp.zeros((2, 4, 4)))
    assert out.shape == (2, 4, 5)
    assert any(k.startswith("vgg_conv") for k in variables["params"])


def test_bfloat16_inference_path():
    """bf16 forward runs and agrees with f32 on argmax for well-separated
    logits (the TPU-native inference dtype)."""
    import jax
    import numpy as np
    f32 = DCPNet(DCPConfig(num_taps=2))
    variables = f32.init_variables(jax.random.PRNGKey(0), num_agents=4)
    bf16 = DCPNet(DCPConfig(num_taps=2, dtype=jnp.bfloat16))
    rng = np.random.RandomState(0)
    obs = jnp.asarray((rng.rand(4, 4, 3, 11, 11) < 0.2).astype(np.float32))
    gso = jnp.zeros((4, 4, 4))
    out32 = np.asarray(f32.apply(variables, obs, gso))
    out16 = np.asarray(bf16.apply(variables, obs, gso)).astype(np.float32)
    assert out16.shape == out32.shape
    # argmax agreement wherever the f32 margin is non-trivial
    margin = np.sort(out32, -1)[..., -1] - np.sort(out32, -1)[..., -2]
    confident = margin > 0.05
    np.testing.assert_array_equal(out16.argmax(-1)[confident],
                                  out32.argmax(-1)[confident])
