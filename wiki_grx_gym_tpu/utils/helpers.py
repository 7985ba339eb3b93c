"""CLI argument parsing + misc helpers (`legged_gym/utils/helpers.py` and
`isaacgym/gymutil.py:298-373` equivalents)."""

from __future__ import annotations

import argparse
import random

import numpy as np


def get_args(argv=None):
    """Mirror of `legged_gym/utils/helpers.py:159-185` (CUDA-specific flags
    like --sim_device/--pipeline are replaced by mesh flags)."""
    parser = argparse.ArgumentParser(description="wiki-grx-gym_tpu RL")
    parser.add_argument("--task", type=str, default="GR1T1")
    parser.add_argument("--resume", action="store_true", default=False)
    parser.add_argument("--experiment_name", type=str, default=None)
    parser.add_argument("--run_name", type=str, default=None)
    parser.add_argument("--load_run", type=str, default=None)
    parser.add_argument("--checkpoint", type=int, default=None)
    parser.add_argument("--headless", action="store_true", default=True)
    parser.add_argument("--num_envs", type=int, default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--max_iterations", type=int, default=None)
    # TPU-native additions
    parser.add_argument("--num_mp", type=int, default=1, help="tensor-parallel mesh size")
    parser.add_argument("--distributed", action="store_true", default=False,
                        help="initialize jax.distributed (multi-host)")
    parser.add_argument("--record", action="store_true", default=False,
                        help="play.py: dump a replayable trajectory artifact "
                             "(traj.npz; animate with tools/visualize.py --replay)")
    return parser.parse_args(argv)


def set_seed(seed: int) -> int:
    """Seed host RNGs (`helpers.py:70-80`); device randomness is keyed from
    the same seed via jax.random.PRNGKey."""
    if seed == -1:
        seed = np.random.randint(0, 10000)
    print(f"Setting seed: {seed}")
    random.seed(seed)
    np.random.seed(seed)
    return seed


def export_policy_npz(net, params, path: str) -> None:
    """Deploy-format export: MLP weights as .npz + a numpy-only forward pass
    (the reference exports TorchScript for its C++ controller,
    `helpers.py:188-231`; a weight archive + reference implementation serves
    the same robot-deployment purpose without a torch dependency)."""
    import numpy as np

    blob = {}
    for i, (w, b) in enumerate(params.actor):
        blob[f"actor_w{i}"] = np.asarray(w)
        blob[f"actor_b{i}"] = np.asarray(b)
    for i, cell in enumerate(getattr(params, "memory_a", None) or ()):
        # recurrent actors: torch.nn.LSTM tensor layout (gate order i,f,g,o)
        blob[f"lstm{i}_w_ih"] = np.asarray(cell.w_ih)
        blob[f"lstm{i}_w_hh"] = np.asarray(cell.w_hh)
        blob[f"lstm{i}_b_ih"] = np.asarray(cell.b_ih)
        blob[f"lstm{i}_b_hh"] = np.asarray(cell.b_hh)
    blob["std"] = np.asarray(params.std)
    blob["activation"] = np.asarray("elu")
    np.savez(path, **blob)


def load_policy_npz(path: str):
    """Numpy-only policy loader for deployment targets."""
    import numpy as np

    blob = np.load(path, allow_pickle=False)
    n_layers = sum(1 for k in blob.files if k.startswith("actor_w"))
    weights = [(blob[f"actor_w{i}"], blob[f"actor_b{i}"]) for i in range(n_layers)]

    def elu(x):
        return np.where(x > 0, x, np.expm1(x))

    def policy(obs):
        x = np.asarray(obs, np.float32)
        for w, b in weights[:-1]:
            x = elu(x @ w + b)
        w, b = weights[-1]
        return x @ w + b

    return policy
