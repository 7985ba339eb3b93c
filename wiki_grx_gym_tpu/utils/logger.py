"""Eval-time state/reward logger — `legged_gym/utils/logger.py:36-137`
equivalent. Collects per-step scalars and renders the same 3x3 dashboard
(joint tracking, base velocity vs command, contact forces); headless-safe
(matplotlib Agg, saved to file instead of an interactive window)."""

from __future__ import annotations

from collections import defaultdict

import numpy as np


class EvalLogger:
    def __init__(self, dt: float):
        self.state_log = defaultdict(list)
        self.rew_log = defaultdict(list)
        self.dt = dt
        self.num_episodes = 0

    def log_state(self, key, value):
        self.state_log[key].append(value)

    def log_states(self, d):
        for k, v in d.items():
            self.log_state(k, v)

    def log_rewards(self, d, num_episodes: int):
        for k, v in d.items():
            if "rew" in k:
                self.rew_log[k].append(v * num_episodes)
        self.num_episodes += num_episodes

    def reset(self):
        self.state_log.clear()
        self.rew_log.clear()

    def print_rewards(self):
        print("Average rewards per second:")
        for k, values in self.rew_log.items():
            mean = np.sum(np.array(values)) / max(self.num_episodes, 1)
            print(f" - {k}: {mean}")
        print(f"Total number of episodes: {self.num_episodes}")

    def save_plots(self, path: str):
        """3x3 dashboard matching utils/logger.py:71-126."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        log = self.state_log
        nb_rows, nb_cols = 3, 3
        fig, axs = plt.subplots(nb_rows, nb_cols, figsize=(15, 10))
        time = np.linspace(0, len(next(iter(log.values()), [0])) * self.dt, max(len(next(iter(log.values()), [0])), 1))

        def plot(ax, keys, title, ylabel):
            for k in keys:
                if k in log and log[k]:
                    ax.plot(time[: len(log[k])], np.asarray(log[k], dtype=object if isinstance(log[k][0], np.ndarray) else None), label=k)
            ax.set(title=title, xlabel="time [s]", ylabel=ylabel)
            ax.legend(fontsize="x-small")

        plot(axs[0, 0], ["base_vel_x", "command_x"], "Base velocity x", "[m/s]")
        plot(axs[0, 1], ["base_vel_y", "command_y"], "Base velocity y", "[m/s]")
        plot(axs[0, 2], ["base_vel_yaw", "command_yaw"], "Base velocity yaw", "[rad/s]")
        plot(axs[1, 0], ["dof_pos", "dof_pos_target"], "DOF position", "[rad]")
        plot(axs[1, 1], ["dof_vel"], "DOF velocity", "[rad/s]")
        plot(axs[1, 2], ["dof_torque"], "DOF torque", "[Nm]")
        plot(axs[2, 0], ["base_vel_z"], "Base velocity z", "[m/s]")
        if "contact_forces_z" in log and log["contact_forces_z"]:
            forces = np.stack(log["contact_forces_z"])
            for i in range(forces.shape[1]):
                axs[2, 1].plot(time[: forces.shape[0]], forces[:, i], label=f"force {i}")
            axs[2, 1].set(title="Vertical contact forces", xlabel="time [s]", ylabel="[N]")
            axs[2, 1].legend(fontsize="x-small")
        plot(axs[2, 2], ["dof_torque"], "Torque/velocity", "[Nm]")
        fig.tight_layout()
        fig.savefig(path, dpi=100)
        plt.close(fig)
        print(f"Saved eval dashboard to {path}")
