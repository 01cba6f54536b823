"""Parity against the ACTUAL reference implementation.

Unlike test_model_parity.py (which checks against a torch oracle re-typed in
this repo), these tests import the reference sources from /root/reference —
``graphs/models/decentralplanner.py`` (DecentralPlannerNet) and
``utils/graphUtils/graphML.py`` (GraphFilterBatch) — instantiate them with a
reference-style config, and assert:

- boundary activations (CNN+compress features, GFL output) allclose,
- final logits allclose,
- exact argmax agreement (what the simulator consumes),

after importing the torch state_dict with params_from_torch_state_dict.
This closes the parity-blindspot: if our reading of the architecture were
wrong, these tests — not just our own oracle — would fail.

The reference imports ``easydict``/``torchsummaryX`` which are not installed;
we register minimal stand-ins (an attr-dict and a no-op ``summary``) before
importing. We read the reference's behavior only — no code is copied.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from reference_loader import AttrDict, load_reference  # noqa: E402

from gnn_pathplanning_tpu.models import (DCPConfig, DCPNet,  # noqa: E402
                                         params_from_torch_state_dict,
                                         torch_state_dict_from_params)


@pytest.fixture(scope="module")
def ref():
    """Import the reference model module with stub third-party deps."""
    return load_reference("graphs.models.decentralplanner")


def _build_ref_model(ref, k_taps=3, num_agents=10, seed=1337):
    cfg = AttrDict(num_agents=num_agents, nGraphFilterTaps=k_taps,
                   device=torch.device("cpu"))
    torch.manual_seed(seed)
    model = ref.DecentralPlannerNet(cfg)
    # Perturb BN running stats so eval-mode normalization is a real test.
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
    model.eval()
    return model


def _random_inputs(rng, b, n):
    obs = rng.rand(b, n, 3, 11, 11).astype(np.float32)
    w = (rng.rand(b, n, n) < 0.4).astype(np.float32)
    w = np.triu(w, 1) + np.triu(w, 1).transpose(0, 2, 1)
    deg = w.sum(-1, keepdims=True)
    s = np.where(deg > 0,
                 w / np.maximum(np.sqrt(deg * deg.transpose(0, 2, 1)), 1e-9),
                 0.0).astype(np.float32)
    return obs, s


@pytest.mark.parametrize("k_taps", [1, 2, 3])
def test_logits_match_reference_model(ref, rng, k_taps):
    b, n = 4, 10
    model = _build_ref_model(ref, k_taps=k_taps, num_agents=n)
    obs, s = _random_inputs(rng, b, n)

    with torch.no_grad():
        model.addGSO(torch.from_numpy(s))
        want = torch.stack(model(torch.from_numpy(obs)), dim=1).numpy()

    variables = params_from_torch_state_dict(model.state_dict())
    ours = DCPNet(DCPConfig(num_taps=k_taps))
    got = np.asarray(ours.apply(variables, jnp.asarray(obs), jnp.asarray(s),
                                train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_boundary_activations_match_reference(ref, rng):
    """Per-layer gate: encoder features (CNN+compressMLP) and graph-filter
    output compared at the module boundaries of the reference forward
    (decentralplanner.py:278-318)."""
    b, n = 3, 10
    model = _build_ref_model(ref, k_taps=3, num_agents=n)
    obs, s = _random_inputs(rng, b, n)

    with torch.no_grad():
        x = torch.from_numpy(obs)
        feats = [model.compressMLP(
            model.ConvLayers(x[:, a]).flatten(1)) for a in range(n)]
        ref_feats = torch.stack(feats, dim=2)               # B x G x N
        model.GFL[0].addGSO(torch.from_numpy(s).unsqueeze(1))
        ref_gfl = model.GFL(ref_feats)                      # B x F x N

    variables = params_from_torch_state_dict(model.state_dict())
    ours = DCPNet(DCPConfig(num_taps=3))
    _, inter = ours.apply(variables, jnp.asarray(obs), jnp.asarray(s),
                          train=False, capture_intermediates=True)
    inter = inter["intermediates"]

    def pick(name):
        node = inter
        for part in name.split("/"):
            node = node[part]
        return np.asarray(node["__call__"][0])

    # compress0 is the pre-ReLU Dense with agents folded into batch:
    # [B*N, G] -> post-ReLU [B, G, N] for the reference layout.
    got_feats = np.maximum(pick("compress0"), 0.0).reshape(b, n, -1)
    np.testing.assert_allclose(got_feats.transpose(0, 2, 1),
                               ref_feats.numpy(), rtol=2e-4, atol=2e-4)
    got_gfl = pick("gfl0")                 # [B, N, F] (pre-ReLU)
    np.testing.assert_allclose(
        np.maximum(got_gfl, 0.0).transpose(0, 2, 1), ref_gfl.numpy(),
        rtol=2e-4, atol=2e-4)


def test_export_roundtrip_loads_into_reference_model(ref, rng):
    """torch_export: our variables -> reference state_dict -> reference
    model.load_state_dict(strict=True) -> identical logits. This is the
    migration path for checkpoints trained in this framework."""
    import jax
    b, n = 2, 10
    ours = DCPNet(DCPConfig(num_taps=3))
    variables = ours.init_variables(jax.random.PRNGKey(3), num_agents=n)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in torch_state_dict_from_params(variables).items()}

    cfg = AttrDict(num_agents=n, nGraphFilterTaps=3,
                   device=torch.device("cpu"))
    model = ref.DecentralPlannerNet(cfg)
    model.load_state_dict(sd, strict=True)
    model.eval()

    obs, s = _random_inputs(rng, b, n)
    with torch.no_grad():
        model.addGSO(torch.from_numpy(s))
        want = torch.stack(model(torch.from_numpy(obs)), dim=1).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(obs), jnp.asarray(s),
                                train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_graph_filter_batch_math(ref, rng):
    """Our graph_filter against the reference GraphFilterBatch module alone
    (utils/graphUtils/graphML.py:2369) on random weights/GSOs."""
    gml = load_reference("utils.graphUtils.graphML")
    from gnn_pathplanning_tpu.ops.graph_filter import graph_filter

    b, n, g, f, k = 5, 12, 7, 6, 3
    gf = gml.GraphFilterBatch(g, f, k, E=1, bias=True)
    torch.manual_seed(0)
    for p in gf.parameters():
        with torch.no_grad():
            p.normal_(0, 0.3)
    x = rng.randn(b, g, n).astype(np.float32)
    s = rng.randn(b, n, n).astype(np.float32)
    gf.addGSO(torch.from_numpy(s).unsqueeze(1))
    with torch.no_grad():
        want = gf(torch.from_numpy(x)).numpy()     # [B, F, N]

    taps = gf.weight.detach().numpy()[:, 0].transpose(1, 2, 0)  # [K, G, F]
    bias = gf.bias.detach().numpy()[:, 0]
    got = np.asarray(graph_filter(
        jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(s),
        jnp.asarray(taps), jnp.asarray(bias)))     # [B, N, F]
    np.testing.assert_allclose(got.transpose(0, 2, 1), want,
                               rtol=2e-4, atol=2e-4)
