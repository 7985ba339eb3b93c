"""Config dead-knob audit (VERDICT r4 item 4): every declared config field
must be consumed somewhere in the framework, or sit on the explicit
reference-schema allowlist below. Dead knobs are how fidelity bugs hide —
`terrain.measure_heights` was declared-but-ignored for three rounds.

The walk treats nested classes as sections (recursed) and plain-dict
values as DATA (their keys are joint/link names, not knobs)."""

from pathlib import Path

from wiki_grx_gym_tpu.envs import task_registry

ROOT = Path(__file__).resolve().parents[1]

# declared by the REFERENCE config schema and never read by the reference
# either (verified by grep over /root/reference/legged_gym — e.g.
# curriculum_chg_* appears only in its config files); kept for schema
# parity, excluded from the consumption requirement
REFERENCE_DEAD = {
    "curriculum_chg_lin_vel_x", "curriculum_chg_lin_vel_y",
    "curriculum_chg_ang_vel_yaw", "curriculum_max_lin_vel_x",
    "curriculum_max_lin_vel_y", "curriculum_max_ang_vel_yaw",
    "sigma_feet_air_time_mid", "sigma_on_the_air",
}


def _walk(cls, out, prefix=""):
    for k in dir(cls):
        if k.startswith("_"):
            continue
        v = getattr(cls, k)
        if isinstance(v, type):
            _walk(v, out, prefix + k + ".")
        elif isinstance(v, property) or callable(v):
            continue
        elif isinstance(v, dict):
            out[prefix + k] = "data"   # keys are names, the FIELD is the knob
        else:
            out[prefix + k] = "leaf"


def test_no_dead_config_knobs():
    fields = {}
    for task in ("GR1T1", "GR1T1_full"):
        env_cfg, train_cfg = task_registry.get_cfgs(task)
        _walk(type(env_cfg), fields)
        _walk(type(train_cfg), fields)

    src = ""
    for pat in ("wiki_grx_gym_tpu/**/*.py", "tools/*.py", "*.py"):
        for f in ROOT.glob(pat):
            if "config" in f.name:    # declarations don't count as consumption
                continue
            src += f.read_text()

    dead = sorted(
        path.rsplit(".", 1)[-1]
        for path, kind in fields.items()
        if path.rsplit(".", 1)[-1] not in src
        and path.rsplit(".", 1)[-1] not in REFERENCE_DEAD
    )
    assert not dead, f"declared but never consumed: {dead}"
