"""Fused PPO-gradient kernel vs jax.value_and_grad of PPO._minibatch_loss.

The kernel hand-derives the backward pass of the clipped-PPO objective
(learn/fused_update.py); these tests pin it, leaf by leaf, to JAX autodiff
of the exact XLA loss it replaces — at f32 operand dtype in interpreter
mode so the comparison is tight (the only differences are accumulation
order across batch tiles).
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wiki_grx_gym_tpu.envs import task_registry
from wiki_grx_gym_tpu.learn.fused_update import FusedPPOGrad
from wiki_grx_gym_tpu.learn.networks import ActorCritic
from wiki_grx_gym_tpu.learn.ppo import PPO


def _make_net(fixed_std=False, hidden=(64, 32)):
    _, train_cfg = task_registry.get_cfgs("GR1T1")
    pc = train_cfg.policy
    pc.actor_hidden_dims = list(hidden)
    pc.critic_hidden_dims = list(hidden)
    pc.fixed_std = fixed_std
    net = ActorCritic(
        num_actor_input=39, num_critic_input=168, num_actions=23, policy_cfg=pc
    )
    return net, train_cfg.algorithm


def _make_minibatch(key, rows, net, spread=1.0):
    ks = jax.random.split(key, 10)
    a = net.num_actions
    mb = {
        "obs": jax.random.normal(ks[0], (rows, net.num_actor_input)) * spread,
        "critic_obs": jax.random.normal(ks[1], (rows, net.num_critic_input)) * spread,
        "actions": jax.random.normal(ks[2], (rows, a)) * 0.3,
        "log_prob": jax.random.normal(ks[3], (rows,)) * 0.5 + 20.0,
        "mu": jax.random.normal(ks[4], (rows, a)) * 0.3,
        "sigma": jax.random.uniform(ks[5], (rows, a), minval=0.15, maxval=0.3),
        "values": jax.random.normal(ks[6], (rows,)),
        "returns": jax.random.normal(ks[7], (rows,)),
        "advantages": jax.random.normal(ks[8], (rows,)),
    }
    return mb


def _bufs_from_mb(mb, rows):
    """Arrange one minibatch as the (MB=1, rows, F) kernel buffers
    (fscal = the f32 shuffle-pack lane order, learn/ppo._pack_shuffle)."""
    f = lambda x: x[None].astype(jnp.float32)
    col = lambda x: x[:, None]
    return dict(
        obs=f(mb["obs"]),
        cobs=f(mb["critic_obs"]),
        fscal=f(
            jnp.concatenate(
                [
                    mb["actions"],
                    col(mb["log_prob"]),
                    mb["mu"],
                    mb["sigma"],
                    col(mb["values"]),
                    col(mb["returns"]),
                    col(mb["advantages"]),
                ],
                axis=-1,
            )
        ),
    )


def _check(net, alg_cfg, rows, tile, fixed_std=False, clipped_vl=True, seed=0):
    alg_cfg.use_clipped_value_loss = clipped_vl
    ppo = PPO(net, alg_cfg)
    params = net.init(jax.random.PRNGKey(seed))
    if not fixed_std:
        # realistic (non-init) std so std grads are nontrivial
        params = params.replace(std=0.2 + 0.1 * jnp.arange(net.num_actions) / net.num_actions)
    mb = _make_minibatch(jax.random.PRNGKey(seed + 1), rows, net)

    (ref_loss, ref_aux), ref_grads = jax.value_and_grad(
        ppo._minibatch_loss, has_aux=True
    )(params, mb, None)

    fused = FusedPPOGrad(
        net,
        clip_param=ppo.clip_param,
        value_loss_coef=ppo.value_loss_coef,
        entropy_coef=ppo.entropy_coef,
        use_clipped_value_loss=ppo.use_clipped_value_loss,
        rows=rows,
        num_mini_batches=1,
        tile=tile,
        op_dtype=jnp.float32,
        interpret=True,
    )
    loss, grads, aux = fused.grads(params, _bufs_from_mb(mb, rows), 0)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    np.testing.assert_allclose(float(aux["kl"]), float(ref_aux["kl"]), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        float(aux["value_loss"]), float(ref_aux["value_loss"]), rtol=2e-5
    )
    np.testing.assert_allclose(
        float(aux["surrogate_loss"]), float(ref_aux["surrogate_loss"]), rtol=2e-5, atol=1e-7
    )

    flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_new = jax.tree_util.tree_leaves(grads)
    assert len(flat_ref) == len(flat_new)
    for (path, r), n in zip(flat_ref, flat_new):
        scale = max(1e-6, float(jnp.max(jnp.abs(r))))
        np.testing.assert_allclose(
            np.asarray(n), np.asarray(r), rtol=5e-4, atol=5e-6 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_fused_grads_match_autodiff():
    net, alg_cfg = _make_net()
    # rows=300, tile=128: exercises a partial final tile + masking
    _check(net, alg_cfg, rows=300, tile=128)


def test_fused_grads_tile_divides():
    net, alg_cfg = _make_net()
    _check(net, alg_cfg, rows=256, tile=128, seed=3)


def test_fused_grads_fixed_std():
    net, alg_cfg = _make_net(fixed_std=True)
    _check(net, alg_cfg, rows=200, tile=128, fixed_std=True, seed=5)


def test_fused_grads_unclipped_value_loss():
    net, alg_cfg = _make_net()
    _check(net, alg_cfg, rows=200, tile=128, clipped_vl=False, seed=7)


@pytest.mark.parametrize("mega", [True, False])
def test_fused_whole_update_matches_xla_path(mega):
    """PPO.update end-to-end: the fused path (forced on, interpreter, f32
    operands) must land on the same parameters, LR and metrics as the XLA
    minibatch scan for an identical batch + key — in BOTH forms: the
    whole-update mega-kernel (grads + clip/Adam/LR in one pallas_call) and
    the per-step kernel + optax scan."""
    from wiki_grx_gym_tpu.learn.ppo import Transition

    net, alg_cfg = _make_net(hidden=(32, 32))
    alg_cfg.fused_mega = mega
    alg_cfg.num_learning_epochs = 2
    alg_cfg.num_mini_batches = 2
    alg_cfg.storage_dtype = "float32"
    alg_cfg.update_dtype = "float32"
    t, n = 8, 64

    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 12)
    a = net.num_actions
    mu = jax.random.normal(ks[0], (t, n, a)) * 0.3
    sigma = jnp.full((t, n, a), 0.2)
    actions = mu + sigma * jax.random.normal(ks[1], (t, n, a))
    batch = Transition(
        obs=jax.random.normal(ks[2], (t, n, net.num_actor_input)),
        critic_obs=jax.random.normal(ks[3], (t, n, net.num_critic_input)),
        actions=actions,
        rewards=jax.random.normal(ks[4], (t, n)) * 0.1,
        dones=jnp.zeros((t, n), bool),
        values=jax.random.normal(ks[5], (t, n)),
        log_prob=ActorCritic.log_prob(mu, sigma, actions),
        mu=mu,
        sigma=sigma,
    )
    returns = jax.random.normal(ks[6], (t, n))
    advantages = jax.random.normal(ks[7], (t, n))
    params = net.init(ks[8])
    k_up = ks[9]

    results = {}
    for fused in (True, False):
        alg_cfg.fused_update = fused
        ppo = PPO(net, alg_cfg)
        assert ppo.fused_update == fused
        st = ppo.init(params)
        st2, metrics = ppo.update(st, batch, returns, advantages, k_up)
        results[fused] = (st2, metrics)

    st_f, m_f = results[True]
    st_x, m_x = results[False]
    for k in ("value_loss", "surrogate_loss", "kl", "lr"):
        np.testing.assert_allclose(
            float(m_f[k]), float(m_x[k]), rtol=2e-4, err_msg=f"metric {k}"
        )
    for (path, r), f in zip(
        jax.tree_util.tree_leaves_with_path(st_x.params),
        jax.tree_util.tree_leaves(st_f.params),
    ):
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(r), rtol=2e-3, atol=2e-5,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}",
        )


def test_fused_supported_gate():
    net, _ = _make_net()
    assert FusedPPOGrad.supported(net, None)
    assert not FusedPPOGrad.supported(net, lambda p, mb: 0.0)

    _, train_cfg = task_registry.get_cfgs("GR1T1")
    pc = train_cfg.policy
    pc.activation = "tanh"
    net2 = ActorCritic(39, 168, 23, pc)
    assert not FusedPPOGrad.supported(net2, None)


def test_fused_dp2_matches_single_device():
    """dp-mesh fused path: the per-shard kernel + gradient pmean under
    shard_map must land on the same params/metrics as the single-device
    fused scan when the minibatch composition matches (perm_groups pinned
    to 2 in both)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wiki_grx_gym_tpu.learn.ppo import Transition
    from wiki_grx_gym_tpu.parallel.mesh import make_mesh

    net, alg_cfg = _make_net(hidden=(32, 32))
    alg_cfg.num_learning_epochs = 2
    alg_cfg.num_mini_batches = 2
    alg_cfg.storage_dtype = "float32"
    alg_cfg.update_dtype = "float32"
    alg_cfg.fused_update = True
    alg_cfg.permutation_groups = 2
    t, n = 6, 32

    key = jax.random.PRNGKey(21)
    ks = jax.random.split(key, 12)
    a = net.num_actions
    mu = jax.random.normal(ks[0], (t, n, a)) * 0.3
    sigma = jnp.full((t, n, a), 0.2)
    actions = mu + sigma * jax.random.normal(ks[1], (t, n, a))
    batch = Transition(
        obs=jax.random.normal(ks[2], (t, n, net.num_actor_input)),
        critic_obs=jax.random.normal(ks[3], (t, n, net.num_critic_input)),
        actions=actions, rewards=jnp.zeros((t, n)), dones=jnp.zeros((t, n), bool),
        values=jax.random.normal(ks[5], (t, n)),
        log_prob=ActorCritic.log_prob(mu, sigma, actions),
        mu=mu, sigma=sigma,
    )
    returns = jax.random.normal(ks[6], (t, n))
    advantages = jax.random.normal(ks[7], (t, n))
    params = net.init(ks[8])

    results = {}
    for name, mesh in (("dp2", make_mesh(num_mp=1, devices=jax.devices()[:2])),
                       ("single", None)):
        alg_cfg.fused_update = mesh is not None   # baseline: XLA path, same
        #                                           perm_groups=2 composition
        ppo = PPO(net, alg_cfg, perm_groups=2, mesh=mesh)
        assert ppo.fused_update == (mesh is not None)
        assert (ppo.fused_dp_mesh is not None) == (mesh is not None)
        st = ppo.init(params)
        b, r, adv = batch, returns, advantages
        if mesh is not None:
            sh = NamedSharding(mesh, P(None, "dp"))
            put = lambda x: jax.device_put(
                x, NamedSharding(mesh, P(*( [None, "dp"] + [None]*(x.ndim-2) )))
            )
            b = jax.tree.map(put, batch)
            r, adv = put(returns), put(advantages)
        st2, m = ppo.update(st, b, r, adv, ks[9])
        results[name] = (jax.device_get(m),
                         jax.device_get(jax.tree.leaves(st2.params)))

    m_d, p_d = results["dp2"]
    m_s, p_s = results["single"]
    for k in ("value_loss", "surrogate_loss", "kl", "lr"):
        np.testing.assert_allclose(float(m_d[k]), float(m_s[k]), rtol=2e-4,
                                   err_msg=f"metric {k}")
    for x, y in zip(p_d, p_s):
        np.testing.assert_allclose(x, y, rtol=1e-3, atol=2e-5)


@pytest.mark.parametrize("path", ["mega", "step", "xla"])
def test_std_floor_projected_in_every_update_path(path):
    """noise_std_floor (base_config.policy): with the floor set ABOVE the
    current std, one PPO.update must project every std dim to >= floor in
    all three update paths (mega kernel, per-step kernel + optax, XLA
    scan) — the projection happens after each optimizer step, so the final
    params carry it."""
    from wiki_grx_gym_tpu.learn.ppo import Transition

    _, train_cfg = task_registry.get_cfgs("GR1T1")
    pc = train_cfg.policy
    pc.actor_hidden_dims = [32, 32]
    pc.critic_hidden_dims = [32, 32]
    pc.noise_std_floor = 0.3  # above init_noise_std=0.2 -> forces the clamp
    net = ActorCritic(39, 168, 23, policy_cfg=pc)
    alg_cfg = train_cfg.algorithm
    alg_cfg.fused_update = path != "xla"
    alg_cfg.fused_mega = path == "mega"
    alg_cfg.num_learning_epochs = 2
    alg_cfg.num_mini_batches = 2
    alg_cfg.storage_dtype = "float32"
    alg_cfg.update_dtype = "float32"
    t, n = 8, 64

    ks = jax.random.split(jax.random.PRNGKey(5), 10)
    a = net.num_actions
    mu = jax.random.normal(ks[0], (t, n, a)) * 0.3
    sigma = jnp.full((t, n, a), 0.2)
    actions = mu + sigma * jax.random.normal(ks[1], (t, n, a))
    batch = Transition(
        obs=jax.random.normal(ks[2], (t, n, net.num_actor_input)),
        critic_obs=jax.random.normal(ks[3], (t, n, net.num_critic_input)),
        actions=actions, rewards=jnp.zeros((t, n)), dones=jnp.zeros((t, n), bool),
        values=jax.random.normal(ks[5], (t, n)),
        log_prob=ActorCritic.log_prob(mu, sigma, actions),
        mu=mu, sigma=sigma,
    )
    params = net.init(ks[8])
    # rollout-side std also honors the floor (safety net for old ckpts)
    assert float(jnp.min(net.std(params))) >= 0.3

    ppo = PPO(net, alg_cfg)
    assert ppo.fused_update == (path != "xla")
    st = ppo.init(params)
    st2, _ = ppo.update(
        st, batch, jax.random.normal(ks[6], (t, n)),
        jax.random.normal(ks[7], (t, n)), ks[9],
    )
    final_std = np.asarray(st2.params.std)
    assert final_std.min() >= 0.3 - 1e-6, final_std
