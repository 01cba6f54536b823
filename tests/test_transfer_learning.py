"""Transfer-learning freeze semantics (reference --train_TL:
only *GFL* / *actions* parameters update)."""
import numpy as np
import jax
import jax.numpy as jnp

from gnn_pathplanning_tpu.models import DCPNet, DCPConfig
from gnn_pathplanning_tpu.train import TrainState
from gnn_pathplanning_tpu.train.trainer import (TrainConfig, make_optimizer,
                                                make_train_step, set_lr,
                                                tl_trainable)


def test_tl_filter_paths():
    assert tl_trainable(("gfl0", "taps"))
    assert tl_trainable(("actions0", "kernel"))
    assert not tl_trainable(("conv0", "kernel"))
    assert not tl_trainable(("compress0", "bias"))


def test_frozen_params_do_not_move(rng):
    model = DCPNet(DCPConfig(num_taps=2))
    cfg = TrainConfig()
    opt = make_optimizer(cfg, trainable_filter=tl_trainable)
    variables = model.init_variables(jax.random.PRNGKey(0), num_agents=3)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=opt.init(variables["params"]),
                       step=jnp.asarray(0, jnp.int32),
                       epoch=jnp.asarray(0, jnp.int32))
    step = make_train_step(model, opt)
    b, n = 8, 3
    args = (jnp.asarray((rng.rand(b, 10, 10) < 0.1).astype(np.float32)),
            jnp.asarray(rng.randint(0, 10, (b, n, 2)).astype(np.int32)),
            jnp.asarray(rng.randint(0, 10, (b, n, 2)).astype(np.int32)),
            jnp.asarray(rng.randint(0, 5, (b, n)).astype(np.int32)),
            jnp.asarray(np.full((b,), 6.0, np.float32)))
    new_state, loss = step(state, *args)
    assert np.isfinite(float(loss))
    for name, sub in new_state.params.items():
        for k, v in sub.items():
            before = np.asarray(state.params[name][k])
            after = np.asarray(v)
            if tl_trainable((name, k)):
                assert np.abs(after - before).max() > 0, (name, k)
            else:
                np.testing.assert_array_equal(after, before, err_msg=f"{name}/{k}")


def test_set_lr_works_with_masked_chain():
    cfg = TrainConfig()
    opt = make_optimizer(cfg, trainable_filter=tl_trainable)
    params = {"gfl0": {"taps": jnp.ones((2, 4, 4))},
              "conv0": {"kernel": jnp.ones((3, 3, 3, 8))}}
    st = opt.init(params)
    st2 = set_lr(st, 0.42)
    # find the injected lr
    found = []
    def walk(s):
        if hasattr(s, "hyperparams"):
            found.append(float(s.hyperparams["lr"]))
        if hasattr(s, "_fields"):
            for f in s._fields:
                walk(getattr(s, f))
        elif isinstance(s, tuple):
            for x in s:
                walk(x)
    walk(st2)
    assert found and abs(found[0] - 0.42) < 1e-6
